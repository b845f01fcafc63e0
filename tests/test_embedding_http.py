"""A9/U2 embedding source: batched plumbing (fake mode) + the REAL HTTP
client against an in-process localhost server — nothing leaves the machine."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources import embedding_http as emb


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4, app_name="emb-test")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 5}") for i in range(50)],
        "doc_id long, text string",
    )


def test_fake_mode_is_deterministic_and_unit_norm(spark, docs):
    out = emb.embed_documents(docs, dim=16).collect()
    assert len(out) == 50
    by_id = {r["doc_id"]: list(r["embedding"]) for r in out}
    for i, v in by_id.items():
        assert len(v) == 16
        assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-3)
        assert v == pytest.approx(
            emb.fake_embedding(f"document number {i} about topic {i % 5}", 16),
            abs=1e-6,
        )
    again = {r["doc_id"]: list(r["embedding"]) for r in emb.embed_documents(docs, dim=16).collect()}
    assert by_id == again


def test_fake_embeddings_feed_similarity_operators(spark, docs):
    from pdf_parser_spark.operators import similarity

    e = emb.embed_documents(docs, dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top = similarity.cosine_topk(e, query_id=0, k=5).collect()
    assert len(top) == 5 and all(r["cosine"] <= 1.0 for r in top)


class _Handler(BaseHTTPRequestHandler):
    """OpenAI-shaped embeddings endpoint; counts requests + batch sizes."""

    requests: list[int] = []

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        texts = body["input"]
        type(self).requests.append(len(texts))
        data = [
            {"index": i, "embedding": emb.fake_embedding(t, 8)}
            for i, t in enumerate(texts)
        ]
        out = json.dumps({"model": body["model"], "data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_endpoint():
    _Handler.requests = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/v1/embeddings"
    server.shutdown()


def test_real_http_client_batches_and_matches(spark, docs, http_endpoint):
    out = emb.embed_documents(
        docs.repartition(2), endpoint=http_endpoint, dim=8, batch_size=10, fake=False
    ).collect()
    assert len(out) == 50
    for r in out:
        expect = emb.fake_embedding(r["text"], 8)
        assert list(r["embedding"]) == pytest.approx(expect, abs=1e-6)
    # batching really happened: every request carried <= batch_size texts,
    # and far fewer requests than rows were made
    assert _Handler.requests and max(_Handler.requests) <= 10
    assert len(_Handler.requests) <= 10  # 50 rows / 10 per batch across partitions


def test_real_mode_requires_endpoint(docs):
    with pytest.raises(ValueError):
        emb.embed_documents(docs, fake=False)


def test_post_batch_retries_then_raises():
    with pytest.raises(RuntimeError):
        emb._post_batch("http://127.0.0.1:9/none", "m", ["x"], timeout=0.2, retries=1)
