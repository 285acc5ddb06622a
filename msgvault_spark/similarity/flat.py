"""Flat (unrolled) fixed-dimension vector kernels — bit-identical twins
of the interpreted higher-order folds in knn.py.

MEASURED NEGATIVE RESULT (round 9, tools/bench_flat.py): at d=64 the
flat cosine is 0.4× the fold (2.65s vs 1.08s over 2M persisted pairs) —
a 128-`element_at` tree falls out of whole-stage codegen into per-node
interpretation, which loses to the fold's tight specialized loop; the
16-dot projection shape reads only 1.2×. So these kernels are NOT a
perf replacement for the folds (the real fix for pair rescores is the
GEMM-margin + fold-verify two-phase of dedup/embedding.py:
allpairs_near_dups — 0.02× vs DuckDB at sf1). This module stays as the
BIT-EXACTNESS HARNESS: tests/test_flat_vector.py pins exact float
equality between fold and unrolled order over ±0.0 / zero-norm /
float32-cast / magnitude-spread edges, the safety proof any future
kernel swap (including a GEMM verify stage) must clear.

Bit-exactness contract (pinned by tests/test_flat_vector.py): every
kernel reproduces the fold's exact float operation order —
``0.0 + t_1 + t_2 + …`` left-associated, one term per dimension, each
term ``CAST(elem AS DOUBLE) [* CAST(elem AS DOUBLE) | * literal]`` —
so swapping a fold for its flat twin can never change an oracle hash.
(IEEE addition is not associative; a reassociated or pairwise sum would
NOT be safe. The leading 0.0 is kept: dropping it differs on an
all-(-0.0) term list.)

Plan-construction cost: kernels render as ONE SQL string parsed by
`F.expr` — O(1) Py4J round-trips, the functions/arrays.py
lit_double_array trick — instead of ~3·d driver round-trips of Column
operator calls. Literal doubles use repr() shortest-round-trip form,
which Spark's lexer parses back to the identical IEEE-754 value.

Call sites stay on the fold versions until an entry's gate-window slot
is open (SCALING.md round-9 note); r10 flips `similarity/rp.py` and
`dedup/embedding.py`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot_coeffs_sql",
    "dot_cols_sql",
    "l2_norm_sql",
    "dot_coeffs",
    "cosine_flat",
]


def _elem(col: str, i: int) -> str:
    """element i (1-based) of array column ``col``, cast like the folds'
    `_as_double` transform casts."""
    return f"CAST(element_at({col}, {i}) AS DOUBLE)"


def dot_coeffs_sql(col: str, coeffs: list[float]) -> str:
    """Σ_d v[d]·c_d against literal coefficients (JL projection, LSH
    hyperplanes): `0.0 + CAST(v[1] AS DOUBLE) * c1 + …`."""
    terms = "".join(
        f" + {_elem(col, i + 1)} * {float(c)!r}D"
        for i, c in enumerate(coeffs)
    )
    return "0.0D" + terms


def dot_cols_sql(col_a: str, col_b: str, dim: int) -> str:
    """Σ_d a[d]·b[d] between two fixed-dim array columns."""
    terms = "".join(
        f" + {_elem(col_a, i)} * {_elem(col_b, i)}"
        for i in range(1, dim + 1)
    )
    return "0.0D" + terms


def l2_norm_sql(col: str, dim: int) -> str:
    """√(Σ_d v[d]²) — the fold order of knn.l2_norm (acc + x*x)."""
    terms = "".join(
        f" + {_elem(col, i)} * {_elem(col, i)}" for i in range(1, dim + 1)
    )
    return f"sqrt(0.0D{terms})"


def dot_coeffs(col: str, coeffs: list[float]) -> Column:
    return F.expr(dot_coeffs_sql(col, coeffs))


def cosine_flat(col_a: str, col_b: str, dim: int) -> Column:
    """Codegen twin of knn.cosine over RAW (float or double) array
    columns: NULL on zero norm via try_divide, like the fold version."""
    return F.expr(
        f"try_divide({dot_cols_sql(col_a, col_b, dim)}, "
        f"{l2_norm_sql(col_a, dim)} * {l2_norm_sql(col_b, dim)})"
    )
