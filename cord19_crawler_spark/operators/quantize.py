"""Embedding compression for similarity search at scale: scalar
quantization (SQ) and product quantization (PQ, Jegou, Douze & Schmid,
TPAMI 2011) with asymmetric-distance (ADC) scoring.

Why this exists: at the 10^10-document design point the embedding column
dominates storage and scan cost (64 float32 dims = 256 B/doc).  SQ cuts
the scanned bytes 4x (uint8 codes) with a cheap decode; PQ cuts them
32x (m=8 one-byte codes) and scores candidates WITHOUT decoding via a
per-query lookup table — the standard IVF-PQ serving layout.  Both are
expressed as pure-Catalyst plans (higher-order functions; no Python in
the hot path) and pinned by DuckDB oracles.

Codebook note: ``pq_codebook`` builds the deterministic EXEMPLAR
codebook (the subvectors of the ksub lowest-id vectors) so every stage
is oracle-replayable; a production caller trains per-subspace centroids
on a sample with ``similarity.lloyd_kmeans`` and feeds them through the
same (subspace, code, codeword) contract — the encode/ADC plans are
codebook-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NLEVELS = 255  # 8-bit codes 0..255 -> 255 intervals (min..max inclusive)


def sq_minmax(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, lo, hi) training statistics for scalar
    quantization — ``dim`` is 1-based.  One posexplode + map-side-partial
    min/max aggregate; the result is dims-sized (broadcastable)."""
    return (
        emb.select(F.posexplode(vec_col).alias("_i", "_x"))
        .groupBy((F.col("_i") + 1).alias("dim"))
        .agg(
            F.min(F.col("_x").cast("double")).alias("lo"),
            F.max(F.col("_x").cast("double")).alias("hi"),
        )
    )


def _params_row(params: DataFrame):
    """(dim, lo, hi) rows -> ONE row holding dim-ordered lo/hi arrays."""
    return (
        params.agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "lo", "hi"))
            ).alias("_p")
        ).select(
            F.transform("_p", lambda s: s["lo"]).alias("_lo"),
            F.transform("_p", lambda s: s["hi"]).alias("_hi"),
        )
    )


def _sq_code(x, lo, hi):
    """Pinned code rule: round-half-up to 0..255, degenerate dim -> 0."""
    scaled = F.floor((x - lo) / (hi - lo) * F.lit(float(_NLEVELS)) + 0.5)
    clamped = F.least(
        F.lit(_NLEVELS).cast("long"), F.greatest(F.lit(0).cast("long"), scaled)
    )
    return F.when(hi == lo, F.lit(0).cast("long")).otherwise(clamped)


def sq_quantize(
    emb: DataFrame,
    params: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>) — the stored 4x-compressed form.
    Params ride ONE broadcast row; the encode is a scan-side
    higher-order transform (no shuffle, no Python)."""
    row = _params_row(params)
    return emb.crossJoin(F.broadcast(row)).select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x, i: _sq_code(
                x.cast("double"),
                F.element_at(F.col("_lo"), i + 1),
                F.element_at(F.col("_hi"), i + 1),
            ).cast("int"),
        ).alias("codes"),
    )


def sq_decode_expr(codes_col, lo_col, hi_col):
    """Pinned reconstruction: lo + code * (hi - lo) / 255 (degenerate
    dim -> lo).  Scan-side higher-order transform."""
    return F.transform(
        codes_col,
        lambda c, i: F.element_at(lo_col, i + 1)
        + c.cast("double")
        * (F.element_at(hi_col, i + 1) - F.element_at(lo_col, i + 1))
        / F.lit(float(_NLEVELS)),
    )


def sq_search(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize-then-rerank cosine top-k: score every vector in the
    DECODED 8-bit domain (what a stored-codes scan would read), keep the
    ``rerank`` best candidates by (approx desc, vec_id), then score only
    those exactly against the full-precision column.  Returns
    (vec_id, approx_cosine, cosine) ordered (cosine desc, vec_id),
    both rounded to 6 BEFORE any cut (the cross-engine determinism
    contract).

    ``query`` is a 1-row DataFrame with column ``qv`` (array) — data-
    driven, broadcast.  Scale shape: train stats are one dims-sized
    aggregate; encode/decode/approx-score are scan-side HOFs; the only
    corpus-scale ordering is TakeOrderedAndProject at ``rerank`` rows;
    the exact pass touches ``rerank`` rows only (AQE broadcasts them).
    """
    if rerank < k:
        raise ValueError("rerank must be >= k")
    params = sq_minmax(emb, vec_col=vec_col)
    row = _params_row(params)
    q = query.select(
        F.transform("qv", lambda x: x.cast("double")).alias("_q")
    )
    dec = (
        emb.crossJoin(F.broadcast(row))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_v"),
            sq_decode_expr(
                F.transform(
                    F.col(vec_col),
                    lambda x, i: _sq_code(
                        x.cast("double"),
                        F.element_at(F.col("_lo"), i + 1),
                        F.element_at(F.col("_hi"), i + 1),
                    ),
                ),
                F.col("_lo"),
                F.col("_hi"),
            ).alias("_xd"),
        )
        .crossJoin(F.broadcast(q))
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _norm(a):
        return F.sqrt(
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
        )

    approx = dec.select(
        "vec_id",
        "_v",
        "_q",
        F.round(
            _dot(F.col("_xd"), F.col("_q"))
            / (_norm(F.col("_xd")) * _norm(F.col("_q"))),
            6,
        ).alias("approx_cosine"),
    )
    cand = approx.orderBy(
        F.desc("approx_cosine"), F.asc("vec_id")
    ).limit(rerank)
    exact = cand.select(
        "vec_id",
        "approx_cosine",
        F.round(
            _dot(
                F.transform("_v", lambda x: x.cast("double")), F.col("_q")
            )
            / (
                _norm(F.transform("_v", lambda x: x.cast("double")))
                * _norm(F.col("_q"))
            ),
            6,
        ).alias("cosine"),
    )
    return exact.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def _explode_subspaces(df, vec_col, m: int, sub: int, keep):
    """One row per (row, subspace) with the sliced subvector — m is
    small (8), so this is a bounded fan-out, not a dim-level explode."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.slice(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")),
                    s * sub + 1,
                    sub,
                ).alias("subvec"),
            )
            for s in range(m)
        ]
    )
    return df.select(*keep, F.explode(slices).alias("_s")).select(
        *keep,
        F.col("_s.subspace").alias("subspace"),
        F.col("_s.subvec").alias("subvec"),
    )


def pq_codebook(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic exemplar codebook: (subspace, code, codeword) from
    the ksub lowest-id vectors' subvectors (code = rank of vec_id).
    Bounded at m*ksub rows — always broadcastable.  See the module
    docstring for the learned-codebook seam."""
    if dims % m != 0:
        raise ValueError("dims must be divisible by m")
    sub = dims // m
    seeds = emb.orderBy(F.asc(id_col)).limit(ksub)
    coded = seeds.select(
        F.col(id_col).alias("_sid"), F.col(vec_col).alias("_v")
    )
    # rank the (bounded, <= ksub-row) seed frame without an unpartitioned
    # window — same two-phase discipline as every global rank in the repo
    from .ranking import global_row_number

    coded = global_row_number(coded, [F.asc("_sid")], name="_rn").withColumn(
        "code", (F.col("_rn") - 1).cast("int")
    )
    return _explode_subspaces(coded, "_v", m, sub, ["code"]).select(
        "subspace", "code", F.col("subvec").alias("codeword")
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, subspace, code): per subspace, the L2-nearest codeword
    (ties to the lower code).  The codebook is broadcast; distances are
    scan-side folds; the argmin is ONE map-side-partial min_by keyed on
    (vec_id, subspace) — no window over corpus rows.  32x compression
    at m=8/ksub<=256 when written as the stored index."""
    if dims % m != 0:
        raise ValueError("dims must be divisible by m")
    sub = dims // m
    ex = _explode_subspaces(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")),
        "_v",
        m,
        sub,
        ["vec_id"],
    )
    dist = F.aggregate(
        F.zip_with("subvec", "codeword", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # distances compared at 9-decimal precision: summation ORDER differs
    # across engines (in-order fold here, unordered sum in an oracle), so
    # the argmin is pinned to a precision where both agree; ties to the
    # lower code
    return (
        ex.join(F.broadcast(codebook), "subspace")
        .select(
            "vec_id", "subspace", "code", F.round(dist, 9).alias("_d")
        )
        .groupBy("vec_id", "subspace")
        .agg(F.min_by("code", F.struct("_d", "code")).alias("code"))
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Asymmetric-distance top-k: the query builds an m*ksub lookup
    table of squared L2 distances to every codeword (ONE broadcast-
    sized frame), each stored code row joins its LUT cell, and the
    per-vector sum is the ADC distance — the corpus embeddings are
    NEVER read.  Returns (vec_id, adist) rounded to 6, ordered
    (adist asc, vec_id), TakeOrderedAndProject at k.

    ``query``: 1-row DataFrame with column ``qv``."""
    if dims % m != 0:
        raise ValueError("dims must be divisible by m")
    sub = dims // m
    lut = (
        codebook.crossJoin(F.broadcast(query))
        .select(
            "subspace",
            "code",
            F.aggregate(
                F.zip_with(
                    "codeword",
                    F.slice(
                        F.transform("qv", lambda x: x.cast("double")),
                        F.col("subspace") * sub + 1,
                        sub,
                    ),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_qd"),
        )
    )
    return (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("_qd"), 6).alias("adist"))
        .orderBy(F.asc("adist"), F.asc("vec_id"))
        .limit(k)
    )
