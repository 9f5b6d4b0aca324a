from sec_financial_pipeline_spark.functions.deterministic import davg, dsum
from sec_financial_pipeline_spark.functions.scalar import cik_pad, norm_ticker, safe_div

__all__ = ["dsum", "davg", "safe_div", "cik_pad", "norm_ticker"]
