"""Significance kernel as Catalyst column functions + vectorized UDF.

The reference's fuzzy tag-significance test (tags.rb:264-318) splits
into two tiers here:

* native tier (this module, pure Catalyst — F1-F4, F5-lev, F8, F9,
  F10): case/apostrophe/ß/punct folding, Levenshtein distance, the
  whitespace-elision and road-number-prefix equalities, and the odbl
  tag test.  These cover the overwhelming majority of comparisons and
  run JVM-side in whole-stage codegen.
* Python tier (``significant_tag_udf`` — F5-anagram, F6 metaphone, F7
  abbreviation search): an Arrow-batched pandas UDF over the pure
  core, applied ONLY to the rows the native tier couldn't decide —
  the classic cheap-filter-then-expensive-refine pattern.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def normalize(col: Column) -> Column:
    """F1-F4 (tags.rb:266-279): lower, strip apostrophes, ß→ss,
    punct/space runs → single space."""
    s = F.lower(col)
    s = F.regexp_replace(s, "[＇'ʼʹ]", "")
    s = F.regexp_replace(s, "ß", "ss")
    return F.regexp_replace(s, r"[\W_]+", " ")


def odbl_clean(tags: Column) -> Column:
    """F10 (tags.rb:21-41) over a MapType column."""
    return F.exists(
        F.map_entries(tags),
        lambda e: F.lower(e["key"]).isin("odbl", "obdl", "oodbl")
        & F.lower(e["value"]).isin("clean", "clear", "true", "yes", "1"),
    )


def definitely_trivial(old: Column, new: Column) -> Column:
    """Native-only sufficient conditions for *insignificance*:
    normalized equality, small-proportion Levenshtein, whitespace
    elision (F8), road-number prefix fold (F9).  NULL-safe; rows left
    undecided go to the Python tier."""
    o, n = normalize(old), normalize(new)
    lev = F.levenshtein(o, n)
    return (
        (o == n)
        | (lev < F.least(F.length(o), F.length(n)) / F.lit(8))
        | (F.replace(o, F.lit(" "), F.lit("")) == F.replace(n, F.lit(" "), F.lit("")))
        | (
            F.regexp_replace(o, r"\w(\d)", "$1")
            == F.regexp_replace(n, r"\w(\d)", "$1")
        )
    )


def significant_tag_udf():
    """Full-fidelity significance as an Arrow-batched pandas UDF over
    the pure-Python core (metaphone + abbreviation search included)."""
    from ..core.tags import significant_tag

    @F.pandas_udf(BooleanType())
    def _sig(old: pd.Series, new: pd.Series) -> pd.Series:
        return pd.Series(
            [
                bool(significant_tag(o, n)) if o is not None and n is not None
                else None
                for o, n in zip(old, new)
            ]
        )

    return _sig


def significant_tag(old: Column, new: Column) -> Column:
    """Composite: cheap native prefilter decides the easy negatives;
    the pandas UDF runs only on the residue."""
    return F.when(definitely_trivial(old, new), F.lit(False)).otherwise(
        significant_tag_udf()(old, new)
    )
