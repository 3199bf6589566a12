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
