"""The frozen golden query set (FIXTURES.md §3/§Q).

Shared between the freeze script, the pytest rank-identity tests, and
the bench. Coverage: single term, conjunctive, disjunctive, hot-only,
rare+hot mix, repeated term, unknown term, camelCase identifier split.
"""

DOC_QUERIES = [
    ("scan", "and"),
    ("window agg", "and"),
    ("window agg", "or"),
    ("spark stream batch", "and"),
    ("dup", "or"),
    ("scan scan scan", "or"),
    ("missingterm", "and"),
    ("the fast key", "or"),
]

CODE_QUERIES = [
    ("def", "and"),
    ("parseConfig", "and"),
    ("parse config", "and"),
    ("import os error", "or"),
    ("ident_4999", "or"),
    ("missingterm foo", "and"),
    ("block encoder", "and"),
    ("postings", "or"),
]

K = 10
