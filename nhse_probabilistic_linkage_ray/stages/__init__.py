"""Pipeline stages — each a pure function of (config, input Dataset(s)) ->
Dataset, per the design note at SURVEY.md T3: no driver-resident engine
object. Stage order (SURVEY.md §3.4):

ingest -> exact-dedup pre-pass -> signature (actor pool) -> banding/candidates
-> tiered score/verify -> distributed connected components -> report.
"""
