"""MIME functions (F14-F17, D6) + embedding generation pipeline (Q11)."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from msgvault_spark.embeddings_pipeline import (
    active_generation,
    embed_pending,
    fake_embed,
    load_active_vectors,
    pending_queue,
    promote_generation,
)
from msgvault_spark.functions.mime import (
    mime_content_hash,
    normalize_mime,
    preprocess_for_embedding,
    repair_encoding,
    rfc822_message_id,
    zlib_decompress,
)

RAW_A = (
    "Received: from mx.example.com\r\n"
    "DKIM-Signature: v=1; a=rsa-sha256\r\n"
    "Message-ID: <abc@example.com>\r\n"
    "Subject: Hello\r\n"
    "From: a@x.com\r\n"
    "\r\n"
    "Body text here.\r\n"
)
# same logical message via another mailbox: different trace headers, folded
# subject, different header order
RAW_B = (
    "Return-Path: <a@x.com>\r\n"
    "From: a@x.com\r\n"
    "Subject: Hello\r\n"
    "Message-ID: <abc@example.com>\r\n"
    "Received: from other.example.net\r\n"
    "\r\n"
    "Body text here.\r\n"
)


def test_zlib_and_normalize_and_hash(spark):
    df = spark.createDataFrame(
        [(1, zlib.compress(RAW_A.encode())), (2, zlib.compress(RAW_B.encode())),
         (3, b"not compressed")],
        ["id", "raw"],
    )
    decoded = df.select(
        "id", zlib_decompress("raw").cast("string").alias("text")
    )
    rows = {r["id"]: r["text"] for r in decoded.collect()}
    assert rows[1] == RAW_A and rows[3] == "not compressed"

    hashed = decoded.select("id", mime_content_hash(F.col("text")).alias("h"))
    h = {r["id"]: r["h"] for r in hashed.collect()}
    # transport headers differ but the content hash agrees (D2/F15)
    assert h[1] == h[2] != h[3]

    norm = decoded.filter(F.col("id") == 1).select(
        normalize_mime(F.col("text")).alias("n")
    ).head()["n"]
    assert "Received" not in norm and "DKIM" not in norm
    assert norm.splitlines() == sorted(norm.splitlines()[:3]) + ["", "Body text here."]


def test_rfc822_id_and_encoding(spark):
    df = spark.createDataFrame([(1, RAW_A)], ["id", "text"])
    got = df.select(rfc822_message_id(F.col("text")).alias("mid")).head()["mid"]
    assert got == "abc@example.com"

    bad = spark.createDataFrame(
        [(1, "caf\xe9 \x07text".encode("latin-1")), (2, "plain".encode())],
        ["id", "raw"],
    )
    fixed = {r["id"]: r["t"] for r in bad.select(
        "id", repair_encoding("raw").alias("t")).collect()}
    assert fixed[1] == "café text"  # latin-1 fallback + control strip
    assert fixed[2] == "plain"


def test_preprocess_for_embedding(spark):
    body = (
        "Thanks!\n"
        "On Mon, Jan 1, 2024 Bob wrote:\n"
        "> old quoted line\n"
        "> more quote\n"
        "New content.\n"
        "-- \n"
        "Alice\nSignature Corp\n"
    )
    df = spark.createDataFrame([(1, body, "Re: Hi")], ["id", "body", "subject"])
    out = df.select(
        preprocess_for_embedding(F.col("body"), F.col("subject"), 200).alias("t")
    ).head()["t"]
    assert out.startswith("Subject: Re: Hi\n")
    assert "quoted" not in out and "Signature Corp" not in out
    assert "Thanks!" in out and "New content." in out


def test_embedding_generation_lifecycle(spark, tmp_path):
    base = str(tmp_path / "emb")
    corpus = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(10)], ["doc_id", "text"]
    )

    n = embed_pending(corpus, base, 1, dim=8)
    assert n == 10
    assert active_generation(base) is None  # still building

    # converged: nothing pending, re-run writes nothing new
    assert pending_queue(corpus, base, 1).count() == 0
    assert embed_pending(corpus, base, 1, dim=8) == 10

    # dim mismatch against existing generation metadata is rejected
    with pytest.raises(ValueError, match="dim"):
        embed_pending(corpus, base, 1, dim=16)

    # the promote gate rejects non-finite components (the finite-inputs
    # contract the GEMM-margin twins' bit-parity claims rest on): inject
    # a NaN-component vector into the building generation, then clean up
    import math
    import os

    from msgvault_spark.embeddings_pipeline import generation_dir

    vec_path = os.path.join(generation_dir(base, 1), "vectors")
    # array<float> to match what embed_pending writes — the vectors dir has
    # ONE schema, and a differently-typed poison file would hit the
    # mixed-schema gate (tested below) instead of the non-finite gate.
    poison = spark.createDataFrame(
        [(999, [math.nan] + [0.0] * 7)], "id long, embedding array<float>"
    )
    poison.write.mode("append").parquet(vec_path)
    with pytest.raises(ValueError, match="non-finite"):
        promote_generation(spark, base, 1)
    import glob as _glob

    def _drop_rows(pred):
        for f in _glob.glob(os.path.join(vec_path, "*.parquet")):
            df = spark.read.parquet(f)
            if df.filter(pred).count():
                os.remove(f)

    _drop_rows(F.col("id") == 999)

    # a NULL component is as poisonous as NaN for downstream cosine math
    null_poison = spark.createDataFrame(
        [(998, [None] + [0.0] * 7)], "id long, embedding array<float>"
    )
    null_poison.write.mode("append").parquet(vec_path)
    with pytest.raises(ValueError, match="non-finite"):
        promote_generation(spark, base, 1)
    _drop_rows(F.col("id") == 998)

    # a file whose type disagrees with the generation schema fails the
    # gate's own ValueError deterministically (not a decoder error whose
    # timing depends on parquet footer listing order)
    mistyped = spark.createDataFrame(
        [(997, [0.0] * 8)], "id long, embedding array<double>"
    )
    mistyped.write.mode("append").parquet(vec_path)
    with pytest.raises(ValueError, match="generation schema"):
        promote_generation(spark, base, 1)
    for f in _glob.glob(os.path.join(vec_path, "*.parquet")):
        try:
            df = spark.read.schema(
                "id long, embedding array<double>"
            ).parquet(f)
            if df.filter(F.col("id") == 997).count():
                os.remove(f)
        except Exception:
            continue

    meta = promote_generation(spark, base, 1)
    assert meta["status"] == "active"
    vec = load_active_vectors(spark, base)
    assert vec.count() == 10
    assert vec.select(F.size("embedding").alias("d")).distinct().head()["d"] == 8

    # determinism: same text → same vector
    assert fake_embed(["x"], 4) == fake_embed(["x"], 4)

    # incremental: corpus grows, only the delta is pending in a NEW build
    bigger = corpus.unionByName(
        spark.createDataFrame([(10, "new doc")], ["doc_id", "text"])
    )
    assert pending_queue(bigger, base, 1).count() == 1
    embed_pending(bigger, base, 1, dim=8)
    assert spark.read.parquet(f"{base}/gen=1/vectors").count() == 11


# ---------------------------------------------------------------------------
# Python UDTF surface (functions/udtf_ops.py)
# ---------------------------------------------------------------------------


def test_adaptive_embed_downshift_on_flaky_client():
    """The worker.go batching contract on a flaky client: batches over the
    server's capacity fail → halve and retry the same items; sustained
    success grows back; every item embedded exactly once, in order."""
    import pytest

    from msgvault_spark.embeddings_pipeline import adaptive_embed

    attempts = []

    def flaky(texts, dim):
        if len(texts) > 8:  # server chokes past 8
            raise RuntimeError("batch too large")
        return [[float(len(t))] * dim for t in texts]

    ids = list(range(40))
    texts = [f"t{i}" for i in ids]
    got_ids = []
    for chunk_ids, vecs in adaptive_embed(
        ids, texts, 2, flaky, initial_batch=64, grow_after=2,
        on_batch=lambda size, ok: attempts.append((size, ok)),
    ):
        assert len(chunk_ids) == len(vecs)
        got_ids += chunk_ids
    assert got_ids == ids  # exactly once, input order
    # downshift path: 40 (all remaining) fail → 32 fail → 16 fail → 8 ok
    assert attempts[:4] == [(40, False), (32, False), (16, False), (8, True)]
    # growth retried 16 after 2 successes and failed again → back to 8
    assert (16, False) in attempts[4:]

    # a client that always fails propagates once the floor is reached
    def dead(texts, dim):
        raise RuntimeError("down")

    with pytest.raises(RuntimeError):
        list(adaptive_embed([1], ["x"], 2, dead, initial_batch=4, min_batch=1))


def test_embed_pending_with_flaky_client(spark, tmp_path):
    """End-to-end: embed_pending completes through a flaky injected client
    (downshift inside mapInPandas), and the generation promotes."""
    from msgvault_spark.embeddings_pipeline import (
        embed_pending,
        fake_embed,
        promote_generation,
    )

    def flaky(texts, dim):
        if len(texts) > 4:
            raise RuntimeError("batch too large")
        return fake_embed(texts, dim)

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    base = str(tmp_path / "gens")
    n = embed_pending(
        docs, base, 1, dim=4, embed_fn=flaky, batch_rows=16
    )
    assert n == 30
    assert promote_generation(spark, base, 1)["status"] == "active"


def test_udtf_sentence_split_matches_jvm_twin(spark):
    from pyspark.sql import functions as F

    from msgvault_spark.functions.udtf_ops import SentenceSplit, sentence_split_expr

    docs = spark.createDataFrame(
        [
            (1, "First sentence. Second one!  Third?"),
            (2, "no terminal punctuation here"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    spark.udtf.register("sentence_split", SentenceSplit)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        """
    ).collect()
    got = {(r["doc_id"], r["sent_idx"]): (r["sentence"], r["n_words"])
           for r in via_udtf}
    assert got[(1, 0)] == ("First sentence.", 2)
    assert got[(1, 1)] == ("Second one!", 2)
    assert got[(1, 2)] == ("Third?", 1)
    assert got[(2, 0)] == ("no terminal punctuation here", 4)
    assert len(got) == 4  # empty/null docs contribute nothing

    # the JVM expression twin yields identical sentence sequences
    via_expr = docs.select(
        "doc_id",
        F.posexplode(sentence_split_expr(F.col("text"))).alias("sent_idx", "sentence"),
    ).collect()
    expr_got = {(r["doc_id"], r["sent_idx"]): r["sentence"] for r in via_expr}
    assert expr_got == {k: v[0] for k, v in got.items()}


def test_media_decode_real_path_with_pil(spark):
    """Real decode behind the import guard: when pillow is installed the
    stub becomes a real image decoder (dims + pixel hash from PIL).
    Skipped where PIL is absent — the guard itself is tested below."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from msgvault_spark.multimodal.binary_ops import decode_media

    buf = io.BytesIO()
    Image.new("RGB", (12, 7), (255, 0, 0)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), None),
         (2, "blob", bytearray(b"not an image"), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (12, 7)
    assert got[1]["pixels_sha"] is not None
    assert got[2]["width"] is None  # undecodable → NULL dims, row kept


def test_media_decode_guard_without_pil(spark):
    """Without pillow the non-fake path must fail loudly (naming the
    missing dependency), never silently emit garbage."""
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; guard path not reachable")
    except ImportError:
        pass

    from msgvault_spark.multimodal.binary_ops import decode_media

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"x"), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    with pytest.raises(Exception, match="PIL|pillow"):
        decode_media(media).collect()


def test_frame_sampling_and_resize_plan(spark):
    from pyspark.sql import functions as F

    from msgvault_spark.multimodal.binary_ops import resize_plan, sample_frames

    decoded = spark.createDataFrame(
        [
            ("m1", 640, 480, 10, "x"),
            ("m2", 100, 224, 1, "y"),   # single frame, no upscale
            ("m3", 224, 448, 3, "z"),
        ],
        "media_id string, width int, height int, n_frames int, pixels_sha string",
    )
    frames = sample_frames(decoded, n_samples=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert by_media["m1"] == [0, 2, 4, 6]   # stride 10//4=2, 4 samples
    assert by_media["m2"] == [0]
    assert by_media["m3"] == [0, 1, 2]
    # every sampled index is a valid frame
    assert all(r["frame_idx"] < r["n_frames"] for r in frames)

    rp = {r["media_id"]: (r["target_w"], r["target_h"]) for r in
          resize_plan(decoded, max_side=224).collect()}
    assert rp["m1"] == (224, 168)   # 640x480 -> long side 224, aspect kept
    assert rp["m2"] == (100, 224)   # already within bounds: untouched
    assert rp["m3"] == (112, 224)


def test_http_embed_client_against_local_server():
    """The real HTTP client (stdlib urllib) against an in-process server:
    correct request shape, correct parse, and failure modes (HTTP 500,
    wrong count) raising — the signal adaptive_embed's halve-and-retry
    keys on. Composes with adaptive_embed end-to-end."""
    import http.server
    import json as _json
    import threading

    from msgvault_spark.embeddings_pipeline import adaptive_embed, http_embed_client

    seen = []
    state = {"mode": "ok"}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = _json.loads(self.rfile.read(n))
            seen.append(req)
            if state["mode"] == "http500":
                self.send_response(500)
                self.end_headers()
                return
            if state["mode"] == "short":
                vecs = [[0.0] * req["dim"]]  # wrong count
            else:
                vecs = [
                    [float(len(t)), float(i)] + [0.0] * (req["dim"] - 2)
                    for i, t in enumerate(req["texts"])
                ]
            body = _json.dumps({"embeddings": vecs}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        client = http_embed_client(
            f"http://127.0.0.1:{srv.server_address[1]}/embed", model="m1"
        )
        vecs = client(["ab", "cdef"], 4)
        assert vecs == [[2.0, 0.0, 0.0, 0.0], [4.0, 1.0, 0.0, 0.0]]
        assert seen[-1]["model"] == "m1" and seen[-1]["dim"] == 4

        state["mode"] = "http500"
        import pytest as _pytest

        with _pytest.raises(Exception):
            client(["x"], 4)
        state["mode"] = "short"
        with _pytest.raises(RuntimeError):
            client(["x", "y"], 4)

        # end-to-end through the adaptive batcher: flaky server downshifts
        state["mode"] = "ok"
        calls = {"n": 0}
        real = client

        def flaky(texts, dim):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient")
            return real(texts, dim)

        got = []
        for ids, vv in adaptive_embed(
            list(range(6)), [f"t{i}" for i in range(6)], 4, flaky,
            initial_batch=4, min_batch=1,
        ):
            got += list(zip(ids, vv))
        assert len(got) == 6 and all(len(v) == 4 for _, v in got)
    finally:
        srv.shutdown()
        srv.server_close()
