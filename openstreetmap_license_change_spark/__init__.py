"""PySpark-native re-expression of the openstreetmap-license-change engine.

A brand-new engine (not a port): the reference's per-element clean /
odbl_clean / unclean eligibility computation over edit histories is
re-expressed as partition-parallel DataFrame operators (window lineage,
broadcast flag joins, an Arrow-batched grouped fold, bounded cascade
joins) over Common-Crawl-style ``pages`` tables, with grid/quad tiling,
broadcast point-in-polygon, cell-local kNN and tile rollups on top.

Reference: zerebubuth/openstreetmap-license-change (Ruby), read-only at
/root/reference.  Citations in docstrings use ``file:line`` into that repo.
"""

__version__ = "0.1.0"
