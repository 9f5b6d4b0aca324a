"""Wire-protocol bindings over the framework-free serving semantics.

The reference fronts its engine with FastAPI (``src/api/main.py``) and
an MCP stdio/SSE server (``src/sec_mcp/server.py``); the engine here
keeps semantics in ``plans.facade`` / ``plans.tools`` and binds them to
transports in this package with the standard library only:

- :mod:`.http` — a ``http.server`` JSON/CSV/parquet binding for
  :class:`~sec_financial_pipeline_spark.plans.facade.ServingFacade`,
  including the reference's 202 background-fetch miss path;
- :mod:`.stdio` — a line-delimited JSON tools/list + tools/call loop
  for :class:`~sec_financial_pipeline_spark.plans.tools.ToolRegistry`,
  mirroring the MCP dispatch shape.
"""
