"""Field-value comparison — pure Catalyst expressions.

Deterministic rebuild of the reference's per-field comparison modes
(/root/reference/extract_thinker/eval/field_comparison.py:38-142):

  * EXACT   — str(expected).strip() == str(predicted).strip()
  * FUZZY   — Levenshtein similarity >= threshold; our ratio is the
              documented deterministic form 1 - dist/max(len) (SURVEY
              §2.9) computed with the builtin ``levenshtein`` so Spark
              and DuckDB agree bit-for-bit.
  * NUMERIC — relative tolerance |p-e|/|e| <= tol, absolute when e==0
              (field_comparison.py:126-142).

SEMANTIC (embedding cosine) is intentionally out of deterministic
scope (the reference itself falls back to fuzzy without the model);
the ANN operators in operators/similarity.py cover the cosine path.

All functions return Column and are used both row-wise (eval joins)
and inside aggregations (metrics.py).
"""

from __future__ import annotations

import json

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column


def _s(c: Column) -> Column:
    return F.trim(c.cast("string"))


def exact_match(expected: Column, predicted: Column) -> Column:
    """NULL==NULL is a match; one-sided NULL is not (reference:32-37)."""
    return F.when(expected.isNull() & predicted.isNull(), F.lit(True)).when(
        expected.isNull() | predicted.isNull(), F.lit(False)
    ).otherwise(_s(expected) == _s(predicted))


def fuzzy_ratio(expected: Column, predicted: Column) -> Column:
    """1 - levenshtein/max(len); 1.0 when both empty."""
    e, p = _s(expected), _s(predicted)
    mx = F.greatest(F.length(e), F.length(p))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        F.round(1.0 - F.levenshtein(e, p) / mx, 6)
    )


def fuzzy_match(
    expected: Column, predicted: Column, threshold: float = 0.8
) -> Column:
    return F.when(expected.isNull() & predicted.isNull(), F.lit(True)).when(
        expected.isNull() | predicted.isNull(), F.lit(False)
    ).otherwise(fuzzy_ratio(expected, predicted) >= F.lit(threshold))


def _canon_scalar(v):
    try:
        o = json.loads(v)
    except (ValueError, TypeError):
        return None
    if isinstance(o, (dict, list)):
        return json.dumps(o, sort_keys=True)
    return None


_canonical_json_udf = None


def canonical_json(col: Column) -> Column:
    """Sorted-key canonical JSON for complex values, NULL when the
    value is not a JSON object/array — json.dumps(sort_keys=True)
    exactly like the reference's complex-value exact compare
    (field_comparison.py:57-64). Spark's to_json does not sort map
    keys, hence the (Arrow-batched) UDF; created lazily so importing
    this module needs no active session."""
    global _canonical_json_udf
    if _canonical_json_udf is None:

        @F.pandas_udf("string")
        def _canon(vals: pd.Series) -> pd.Series:
            return vals.map(_canon_scalar, na_action="ignore")

        _canonical_json_udf = _canon
    return _canonical_json_udf(col)


def exact_match_complex(expected: Column, predicted: Column) -> Column:
    """EXACT compare with the reference's complex-value rule: when both
    sides are JSON objects/arrays, compare their sorted-key canonical
    serializations (key order irrelevant); otherwise fall back to the
    trimmed string compare (field_comparison.py:50-64)."""
    ce, cp = canonical_json(expected), canonical_json(predicted)
    return (
        F.when(expected.isNull() & predicted.isNull(), F.lit(True))
        .when(expected.isNull() | predicted.isNull(), F.lit(False))
        .when(ce.isNotNull() & cp.isNotNull(), ce == cp)
        .otherwise(_s(expected) == _s(predicted))
    )


def numeric_match(
    expected: Column, predicted: Column, tolerance: float = 0.01
) -> Column:
    """Relative-tolerance compare; absolute tolerance at expected == 0;
    non-numeric values fall back to exact match (reference:126-142)."""
    e = _s(expected).try_cast("double")
    p = _s(predicted).try_cast("double")
    numeric_ok = F.when(e == 0, F.abs(p) <= tolerance).otherwise(
        F.abs((p - e) / e) <= tolerance
    )
    return F.when(expected.isNull() & predicted.isNull(), F.lit(True)).when(
        expected.isNull() | predicted.isNull(), F.lit(False)
    ).when(e.isNotNull() & p.isNotNull(), numeric_ok).otherwise(
        _s(expected) == _s(predicted)
    )
