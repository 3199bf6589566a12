"""Shared tokenization expression for text operators.

Lives under functions/ (registry-neutral) so importing it never
triggers operator registration — the registry's module order IS the
driver's execution order, and a cross-operator import must not
reorder it.
"""

from __future__ import annotations

# Whitespace tokens of trimmed text, empties dropped — the one
# tokenizer every text/dedup operator (and its DuckDB oracle twin)
# agrees on.
TOKENS_EXPR = r"filter(split(trim(text), '\\s+'), t -> t != '')"

# Word trigrams over a pre-split token array column named ``toks``
# (short docs collapse to the single joined-token shingle). ONE
# definition shared by b63/b69/b71 — their contract is that the
# capstone funnel applies the SAME repetition rule its standalone
# operators verify, so the rule must not exist in three copies that
# can drift. DUCK_TRIGRAMS_EXPR is the DuckDB twin for the oracles.
TRIGRAMS_EXPR = """CASE WHEN size(toks) < 3 THEN array(array_join(toks, ' '))
    ELSE transform(sequence(1, size(toks) - 2),
         i -> concat_ws(' ', element_at(toks, i),
                        element_at(toks, i + 1),
                        element_at(toks, i + 2)))
    END"""

DUCK_TRIGRAMS_EXPR = """CASE WHEN len(toks) < 3
    THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    END"""


def token_set_fingerprint(toks=None):
    """Column: md5 over the sorted distinct whitespace-token set — the
    exact-dedup join key. ONE definition (r8 review): b24/b55/b68/b71/
    b100 and the a26/a32 ingest twins all join on this rule, and a26/
    a32 additionally join it against parquet-persisted state, so a
    drift in any one inline copy would silently diverge the stream
    dedup from the batch operators with no failing test at the drift
    point. ``toks`` = None derives tokens from ``text`` (TOKENS_EXPR);
    pass a column name/Column to fingerprint a precomputed token array.
    Case-SENSITIVE by design — b32's provenance fingerprint is the
    separate lowercased rule."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if toks is None:
        arr = F.expr(TOKENS_EXPR)
    elif isinstance(toks, Column):
        arr = toks
    else:
        arr = F.col(toks)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(arr)), " "))
