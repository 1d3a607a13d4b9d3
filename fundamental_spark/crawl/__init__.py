"""Distributed URL-frontier + fetch scheduler (the north-star crawl tier)."""

PRIORITY_SEED = 0
PRIORITY_DETAIL = 1
PRIORITY_REFRESH = 2
PRIORITY_PAGINATION = 3
