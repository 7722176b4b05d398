"""The warehouse DAG: staging cleanse, dimension builds, fact load,
quality checks and KPI views — each a pure DataFrame -> DataFrame function
so Catalyst sees one logical plan per step."""
