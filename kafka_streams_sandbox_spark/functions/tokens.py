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
