"""Generic engine operators.

Pure DataFrame -> DataFrame programs (no planner hooks needed — SURVEY.md
§4): upsert/merge, SCD2 versioning, dedup families, similarity search,
text analysis, multimodal plumbing. Each is designed partition-parallel
with no driver-side collects, so the same code runs at 100 TB.
"""
