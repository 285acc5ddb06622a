"""Embedding pipeline: generation lifecycle + pending queue + batch embed.

Reference parity (Q11): sqlite-vec generations move building→active with a
per-generation dimension check; a pending queue feeds batch HTTP calls to an
embedding server with adaptive batch downshift (internal/sqlitevec/
schema.sql:8-64, internal/vector/embed/worker.go:93-706, embed/queue.go).

Spark-first rebuild — a generation is a dataset version:

    <base>/gen=<n>/vectors/*.parquet     (id, embedding)
    <base>/gen=<n>/_generation.json      {"dim": d, "status": ..., "model": m}

  - pending queue = anti-join (corpus minus already-embedded ids) — no
    mutable queue table; re-running converges, claim/reclaim comes free from
    Spark task retry semantics;
  - batch embed = mapInPandas (one Arrow batch ≈ one model/HTTP batch). The
    container has no embedding model, so the default embedder is a
    DETERMINISTIC FAKE (seeded per-text hash → unit vector); swap
    ``embed_fn`` for a real client in production;
  - promote = dimension-check the written vectors, then flip status to
    active — readers only ever see active generations.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The one on-disk contract for generation vectors: every parquet file under
# gen=N/vectors decodes as exactly this. embed_pending writes it, and
# promote_generation / load_active_vectors read with it explicitly so a
# foreign-typed file (e.g. array<double>) fails the same way every run
# instead of depending on which footer wins schema inference.
_VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def fake_embed(texts: list[str], dim: int) -> list[list[float]]:
    """Deterministic stand-in for an embedding model: md5-seeded unit
    vector per text. STUB — replace with a real model/HTTP client
    (``http_embed_client``). Hashes ASCII hex strings only (seed =
    md5(text) hex; component i = first 8 hex chars of md5("seed:i")), so
    ANY engine with a string md5 — DuckDB included — replays it exactly;
    that is what lets the embed-pipeline catalog entry run under the
    value-hash oracle instead of a rows-only check."""
    out = []
    for t in texts:
        seed = hashlib.md5((t or "").encode()).hexdigest()
        vals = []
        for i in range(dim):
            h8 = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]
            vals.append(int(h8, 16) / 2**31 - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        out.append([v / norm for v in vals])
    return out


def http_embed_client(
    endpoint: str,
    *,
    model: str = "default",
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
) -> Callable[[list[str], int], list[list[float]]]:
    """Real HTTP embedding client (stdlib urllib; drop-in for the
    ``embed_fn`` contract the adaptive batcher and ``embed_pending``
    consume — reference embed/worker.go's server call). POSTs
    ``{"model", "dim", "texts": [...]}`` as JSON and expects
    ``{"embeddings": [[...], ...]}`` back, one vector per text, each of
    length ``dim``.

    Error behavior is deliberate: ANY failure (connection, HTTP status,
    malformed body, wrong count/dim) raises — that is exactly the signal
    ``adaptive_embed`` keys its halve-and-retry policy on. Executors each
    build their own client (the callable is pickled by closure), so there
    is no shared connection state to corrupt under task retry.

    The sandbox has no embedding server, so tests exercise this against
    an in-process http.server (tests/test_mime_embed_pipeline.py); the
    deterministic fake stays the default elsewhere."""
    import urllib.request

    def _embed(texts: list[str], dim: int) -> list[list[float]]:
        body = json.dumps(
            {"model": model, "dim": dim, "texts": list(texts)}
        ).encode("utf-8")
        req = urllib.request.Request(
            endpoint,
            data=body,
            headers={"Content-Type": "application/json", **(headers or {})},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status != 200:
                raise RuntimeError(f"embed server HTTP {resp.status}")
            payload = json.loads(resp.read().decode("utf-8"))
        vecs = payload.get("embeddings")
        if not isinstance(vecs, list) or len(vecs) != len(texts):
            raise RuntimeError(
                f"embed server returned {type(vecs).__name__} of "
                f"{len(vecs) if isinstance(vecs, list) else 'n/a'} vectors "
                f"for {len(texts)} texts"
            )
        for v in vecs:
            if not isinstance(v, list) or len(v) != dim:
                raise RuntimeError("embed server returned wrong-dim vector")
        return [[float(x) for x in v] for v in vecs]

    return _embed


def adaptive_embed(
    ids: list,
    texts: list[str],
    dim: int,
    embed_fn: Callable[[list[str], int], list[list[float]]],
    *,
    initial_batch: int = 256,
    min_batch: int = 1,
    grow_after: int = 4,
    on_batch: Callable[[int, bool], None] | None = None,
):
    """The reference embed worker's batching contract (embed/worker.go:93-706)
    around an injectable ``embed_fn``: submit in batches; on a failure,
    HALVE the batch and retry the same items (down to ``min_batch``, where
    the error finally propagates); after ``grow_after`` consecutive
    successes, double back toward ``initial_batch``. Yields (ids_chunk,
    vectors) in input order — every item embedded exactly once.

    Pure driver-free Python so the policy is unit-testable; ``on_batch``
    (size, ok) observes each attempt for tests/metrics."""
    if initial_batch < 1 or min_batch < 1:
        raise ValueError("batch sizes must be >= 1")
    batch = initial_batch
    streak = 0
    pos = 0
    while pos < len(texts):
        chunk_texts = texts[pos : pos + batch]
        try:
            vecs = embed_fn(chunk_texts, dim)
            if on_batch:
                on_batch(len(chunk_texts), True)
        except Exception:
            if on_batch:
                on_batch(len(chunk_texts), False)
            if batch <= min_batch:
                raise
            batch = max(min_batch, batch // 2)
            streak = 0
            continue  # retry the SAME position at the smaller batch
        yield ids[pos : pos + len(chunk_texts)], vecs
        pos += len(chunk_texts)
        streak += 1
        if batch < initial_batch and streak >= grow_after:
            batch = min(initial_batch, batch * 2)
            streak = 0


def generation_dir(base: str, gen: int) -> str:
    return os.path.join(base, f"gen={gen}")


def generation_meta(base: str, gen: int) -> dict | None:
    path = os.path.join(generation_dir(base, gen), "_generation.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _write_meta(base: str, gen: int, meta: dict) -> None:
    os.makedirs(generation_dir(base, gen), exist_ok=True)
    with open(os.path.join(generation_dir(base, gen), "_generation.json"), "w") as f:
        json.dump(meta, f)


def active_generation(base: str) -> int | None:
    """Highest generation whose status is active (readers' view)."""
    best = None
    if not os.path.isdir(base):
        return None
    for name in os.listdir(base):
        if not name.startswith("gen="):
            continue
        gen = int(name.split("=", 1)[1])
        meta = generation_meta(base, gen)
        if meta and meta.get("status") == "active":
            best = gen if best is None else max(best, gen)
    return best


def pending_queue(
    corpus: DataFrame, base: str, gen: int, id_col: str = "doc_id"
) -> DataFrame:
    """Docs not yet embedded in this generation — anti-join against the
    vectors written so far (embed/queue.go's claim table, stateless)."""
    spark = corpus.sparkSession
    vec_path = os.path.join(generation_dir(base, gen), "vectors")
    try:
        done = spark.read.parquet(vec_path).select(F.col("id").alias(id_col))
    except Exception:  # no vectors yet
        return corpus
    return corpus.join(done, id_col, "left_anti")


def embed_pending(
    corpus: DataFrame,
    base: str,
    gen: int,
    *,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: str = "fake-md5",
    embed_fn: Callable[[list[str], int], list[list[float]]] = fake_embed,
    batch_rows: int = 256,
) -> int:
    """One worker pass: embed everything pending into generation ``gen``
    (status building). Returns rows written. ``embed_fn`` is the injected
    client (the deterministic fake by default; a real HTTP client is a
    drop-in with the same (texts, dim) -> vectors signature); each Arrow
    batch runs through ``adaptive_embed``, so a flaky client downshifts
    its call size instead of failing the task (worker.go:93-706)."""
    spark = corpus.sparkSession
    meta = generation_meta(base, gen) or {
        "dim": dim, "status": "building", "model": model,
    }
    if meta["dim"] != dim:
        raise ValueError(f"generation {gen} has dim {meta['dim']}, got {dim}")
    _write_meta(base, gen, meta)

    pending = pending_queue(corpus, base, gen, id_col).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )

    out_schema = _VECTOR_SCHEMA

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk_ids, vecs in adaptive_embed(
                pdf["id"].tolist(),
                pdf["text"].tolist(),
                dim,
                embed_fn,
                initial_batch=batch_rows,
            ):
                yield pd.DataFrame({"id": chunk_ids, "embedding": vecs})

    result = pending.mapInPandas(_embed, schema=out_schema)
    vec_path = os.path.join(generation_dir(base, gen), "vectors")
    result.write.mode("append").parquet(vec_path)
    return spark.read.parquet(vec_path).count()


def promote_generation(spark: SparkSession, base: str, gen: int) -> dict:
    """building → active after validation (fused.go:36-48): every vector
    must have exactly the generation's dim, and every component must be
    FINITE — a NaN/Inf component would poison cosine math downstream, and
    the GEMM-margin twins (dedup/embedding_gemm.py, dedup/decontaminate.py)
    state their bit-parity guarantee for finite inputs because numpy's
    ``cos >= cut`` is False for NaN where Spark's NaN-sorts-greatest says
    true. This gate is where that contract is enforced, once, at ingest."""
    meta = generation_meta(base, gen)
    if meta is None:
        raise FileNotFoundError(f"generation {gen} has no metadata")
    # Read with the generation's OWN schema instead of footer inference:
    # a stray file written as array<double> would otherwise pass or die in
    # the parquet decoder depending on which footer wins file listing.
    # With the explicit schema the mismatch surfaces on every run, and we
    # convert it into this gate's ValueError so callers see one contract.
    vec = spark.read.schema(_VECTOR_SCHEMA).parquet(
        os.path.join(generation_dir(base, gen), "vectors")
    )
    try:
        bad = vec.filter(
            F.col("embedding").isNull() | (F.size("embedding") != meta["dim"])
        ).count()
        if bad:
            raise ValueError(f"{bad} vectors violate dim={meta['dim']}")
        # NULL components are as poisonous as NaN/Inf for the GEMM twins'
        # bit-parity contract, so the gate rejects them too (exists() alone
        # would yield NULL for them and silently pass the vector).
        nonfinite = vec.filter(
            F.exists(
                "embedding",
                lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == float("inf")),
            )
        ).count()
    except ValueError:
        raise
    except Exception as exc:  # parquet type mismatch → gate's own error
        raise ValueError(
            f"generation {gen} vectors dir holds files that do not decode "
            f"as the generation schema (id long, embedding array<float>): "
            f"{exc}"
        ) from exc
    if nonfinite:
        raise ValueError(
            f"{nonfinite} vectors carry non-finite components"
        )
    meta["status"] = "active"
    _write_meta(base, gen, meta)
    return meta


def load_active_vectors(spark: SparkSession, base: str) -> DataFrame:
    gen = active_generation(base)
    if gen is None:
        raise FileNotFoundError(f"no active generation under {base}")
    return spark.read.schema(_VECTOR_SCHEMA).parquet(
        os.path.join(generation_dir(base, gen), "vectors")
    )
