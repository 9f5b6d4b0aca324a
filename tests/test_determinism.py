"""Run-to-run determinism gate (VERDICT r03 ask #3).

Two rounds in a row the driver caught what local parity missed
(`emb_quantization` r02, `doc_pack_chunks` r03): both bugs were
*instability*, not wrong-answer — each query ran once per fresh session
locally, so a plan whose result depends on physical partitioning could
pass every single-shot check and still flip under the driver's session.

This gate executes every registered query TWICE in the same long-lived
session under *perturbed* shuffle parallelism (8 vs 200 partitions) and
compares driver-style value hashes (columns sorted by name, rows sorted,
cells str-rendered — exactly what the round driver hashes). Any operator
whose result set depends on partition boundaries, partial-aggregation
order, or a nondeterministic expression evaluated twice fails HERE
instead of in CORRECTNESS_r{N}.json.

The r03 packing bug class is covered directly: its failure mode was a
``repartitionByRange``+``spark_partition_id`` subtree evaluated twice
with sampler-dependent boundaries — precisely the kind of plan whose
hash moves when ``spark.sql.shuffle.partitions`` moves.
"""

from __future__ import annotations

import hashlib

import pytest

from sec_financial_pipeline_spark.registry import all_queries

QUERIES = all_queries()

_PERTURB = ("8", "200")


def _vhash(df) -> str:
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        "|".join(str(r[i]) for i in order) for r in df.collect()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_stable_under_shuffle_perturbation(name, spark, sf_dir):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        hashes = []
        for sp in _PERTURB:
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            hashes.append(_vhash(QUERIES[name].fn(spark, sf_dir)))
        assert hashes[0] == hashes[1], (
            f"{name}: result hash moved when shuffle partitions changed "
            f"{_PERTURB[0]} -> {_PERTURB[1]} — partition-dependent plan"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
