"""Online serving: bucketed micro-batcher + HTTP server (serve/server.py).

Fast tier: BucketBatcher is pure Python — coalescing, padding, bucket
selection, and error propagation are tested with a stub model. Slow tier:
one end-to-end HTTP test over a real exported artifact (raw and JPEG
payloads, healthz/stats, concurrent-request coalescing).
"""

import json
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from endoscopy_tpu.serve.server import BucketBatcher

SIZE = 8


def _stub_infer(calls):
    """Records every batch shape; returns probs whose row 0 encodes the
    sample's own top-left pixel so per-request routing is checkable."""

    def infer(batch):
        calls.append(batch.shape)
        probs = np.zeros((batch.shape[0], 4), np.float32)
        probs[:, 0] = batch[:, 0, 0, 0] / 255.0
        probs[:, 1] = 1.0 - probs[:, 0]
        return probs

    return infer


def _img(v):
    return np.full((SIZE, SIZE, 3), v, np.uint8)


def test_batcher_single_request_pads_to_smallest_bucket():
    calls = []
    b = BucketBatcher(_stub_infer(calls), SIZE, buckets=(2, 4), max_wait_ms=1)
    try:
        probs = b.submit(_img(255)).result(timeout=10)
        assert probs[0] == pytest.approx(1.0)
        assert calls == [(2, SIZE, SIZE, 3)]  # padded 1 → bucket 2
        s = b.stats()
        assert s["requests"] == 1 and s["batches"] == 1
        assert s["bucket_hist"] == {2: 1}
        assert s["mean_fill"] == pytest.approx(0.5)
    finally:
        b.close()


def test_batcher_coalesces_concurrent_requests():
    calls = []
    # Generous linger: all 6 submissions land in one dispatch group.
    b = BucketBatcher(_stub_infer(calls), SIZE, buckets=(1, 2, 4, 8),
                      max_wait_ms=2000)
    try:
        futs = [b.submit(_img(10 * i)) for i in range(6)]
        rows = [f.result(timeout=30) for f in futs]
        for i, row in enumerate(rows):  # each caller got ITS OWN row back
            assert row[0] == pytest.approx(10 * i / 255.0)
        s = b.stats()
        assert s["requests"] == 6
        assert s["batches"] < 6, "requests were not coalesced"
        assert sum(k * v for k, v in s["bucket_hist"].items()) >= 6
    finally:
        b.close()


def test_batcher_fills_largest_bucket_without_waiting_out_the_linger():
    calls = []
    b = BucketBatcher(_stub_infer(calls), SIZE, buckets=(1, 2),
                      max_wait_ms=60_000)  # would hang if linger ran out
    try:
        f1, f2 = b.submit(_img(1)), b.submit(_img(2))
        t0 = time.monotonic()
        f1.result(timeout=30), f2.result(timeout=30)
        assert time.monotonic() - t0 < 30  # dispatched on full bucket
    finally:
        b.close()


def test_batcher_propagates_model_errors_and_keeps_serving():
    state = {"fail": True}

    def infer(batch):
        if state["fail"]:
            raise RuntimeError("boom")
        return np.ones((batch.shape[0], 4), np.float32)

    b = BucketBatcher(infer, SIZE, buckets=(1,), max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.submit(_img(0)).result(timeout=10)
        state["fail"] = False
        assert b.submit(_img(0)).result(timeout=10)[0] == 1.0
        s = b.stats()
        assert s["errors"] == 1 and s["requests"] == 1
    finally:
        b.close()


def test_batcher_survives_malformed_infer_output():
    """An infer_fn that breaks the (bucket, C) contract must fail that
    group's futures — not kill the dispatcher thread (which would leave
    every later request hanging out its timeout)."""
    state = {"bad": True}

    def infer(batch):
        if state["bad"]:
            return np.float32(0.0)  # scalar: no rows to distribute
        return np.ones((batch.shape[0], 4), np.float32)

    b = BucketBatcher(infer, SIZE, buckets=(1,), max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="infer returned shape"):
            b.submit(_img(0)).result(timeout=10)
        state["bad"] = False
        assert b.submit(_img(0)).result(timeout=10)[0] == 1.0
        assert b.stats()["errors"] == 1
    finally:
        b.close()


def test_submit_after_close_fails_fast():
    b = BucketBatcher(_stub_infer([]), SIZE, buckets=(1,), max_wait_ms=1)
    b.close()
    fut = b.submit(_img(0))
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=1)  # resolved instantly, no queue wait


def test_batcher_request_racing_past_close_resolves_with_error():
    """A submit that lands after close()'s stop marker must still resolve
    (with an error) — an unresolved Future would block its handler thread
    for the full request timeout."""
    started, release = threading.Event(), threading.Event()

    def infer(batch):
        started.set()
        release.wait(10)
        return np.zeros((batch.shape[0], 4), np.float32)

    b = BucketBatcher(infer, SIZE, buckets=(1,), max_wait_ms=1)
    f1 = b.submit(_img(0))
    assert started.wait(10)              # dispatcher is inside infer
    closer = threading.Thread(target=b.close)
    closer.start()
    time.sleep(0.2)                      # stop marker is now queued
    f2 = b.submit(_img(1))               # races in AFTER the stop marker
    release.set()
    assert f1.result(timeout=10) is not None
    with pytest.raises(RuntimeError, match="shutting down"):
        f2.result(timeout=10)
    closer.join(timeout=15)
    assert not closer.is_alive()


def test_batcher_dispatcher_exits_when_close_consumes_stop_sentinel():
    """close() joins with a timeout; when the dispatcher is still inside a
    long infer_fn at join expiry, close()'s drain consumes the _STOP
    sentinel. The dispatcher must still exit (via the _closed poll) instead
    of blocking forever on the queue — a stuck dispatcher leaks the thread
    AND strands any submit that raced in behind it."""
    started, release = threading.Event(), threading.Event()

    def infer(batch):
        started.set()
        release.wait(10)
        return np.zeros((batch.shape[0], 4), np.float32)

    b = BucketBatcher(infer, SIZE, buckets=(1,), max_wait_ms=1)
    f1 = b.submit(_img(0))
    assert started.wait(10)               # dispatcher is inside infer
    b.close(join_timeout_s=0.1)           # expires mid-infer; drain eats _STOP
    release.set()                         # infer returns post-close
    assert f1.result(timeout=10) is not None
    b._thread.join(timeout=5)             # must exit via the _closed poll
    assert not b._thread.is_alive(), "dispatcher thread leaked after close()"
    # and a submit landing now fails fast instead of hanging
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit(_img(1)).result(timeout=5)


def test_http_handler_times_out_stalled_body():
    """A client that sends headers but stalls mid-body must not park a
    handler thread forever (slowloris): _Handler.timeout bounds the socket
    read and the connection is torn down."""
    import socket

    from endoscopy_tpu.serve.server import ModelServer, _Handler

    def infer(batch):
        return np.zeros((batch.shape[0], 4), np.float32)

    server = ModelServer(("127.0.0.1", 0), infer, input_size=SIZE,
                         num_classes=4, buckets=(1,), max_wait_ms=1,
                         backend="cpu")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    old_timeout = _Handler.timeout
    _Handler.timeout = 1
    try:
        assert old_timeout is not None and old_timeout > 0
        body_len = SIZE * SIZE * 3
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall((f"POST /predict HTTP/1.1\r\n"
                       f"Host: x\r\nContent-Length: {body_len}\r\n"
                       f"Content-Type: application/octet-stream\r\n"
                       f"\r\n").encode())
            s.sendall(b"\x00" * 16)      # partial body, then stall
            s.settimeout(10)
            t0 = time.monotonic()
            data = b""
            while True:                  # server must close (possibly after
                chunk = s.recv(4096)     # an error reply) within ~timeout
                if not chunk:
                    break
                data += chunk
            assert time.monotonic() - t0 < 8
        # server still serves new connections afterwards
        assert _get(f"http://127.0.0.1:{port}/healthz",
                    timeout=10)["status"] == "ok"
    finally:
        _Handler.timeout = old_timeout
        server.close()


def test_http_server_resources_stable_under_churn():
    """Connection churn (every request a fresh socket) must not accumulate
    handler threads or file descriptors — the leak vector behind both the
    slowloris and dispatcher-exit fixes."""
    import os
    import urllib.request

    from endoscopy_tpu.serve.server import ModelServer

    def infer(batch):
        probs = np.zeros((batch.shape[0], 4), np.float32)
        probs[:, 0] = 1.0
        return probs

    server = ModelServer(("127.0.0.1", 0), infer, input_size=SIZE,
                         num_classes=4, buckets=(1, 2, 4), max_wait_ms=1,
                         backend="cpu")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/predict"
    payload = _img(3).tobytes()

    def fds():
        return len(os.listdir("/proc/self/fd"))

    def hit(n):
        for _ in range(n):
            req = urllib.request.Request(
                url, data=payload, method="POST",
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=30) as r:
                assert json.loads(r.read())["pred"] == 0

    try:
        hit(20)  # settle allocator/thread pools before baselining
        base_threads, base_fds = threading.active_count(), fds()
        workers = [threading.Thread(target=hit, args=(40,)) for _ in range(4)]
        for w in workers:
            w.start()
        for w in workers:
            w.join(timeout=120)
        assert not any(w.is_alive() for w in workers)
        deadline = time.monotonic() + 10  # handler threads unwind async
        while time.monotonic() < deadline:
            if (threading.active_count() <= base_threads + 2
                    and fds() <= base_fds + 4):
                break
            time.sleep(0.25)
        assert threading.active_count() <= base_threads + 2, (
            f"thread leak: {base_threads} -> {threading.active_count()}")
        assert fds() <= base_fds + 4, f"fd leak: {base_fds} -> {fds()}"
        assert server.batcher.stats()["requests"] >= 180
    finally:
        server.close()


def test_batcher_rejects_wrong_shape():
    b = BucketBatcher(_stub_infer([]), SIZE, buckets=(1,))
    try:
        with pytest.raises(ValueError, match="canonical"):
            b.submit(np.zeros((SIZE + 1, SIZE, 3), np.uint8))
    finally:
        b.close()


# ---------------------------------------------------------------------------
# End-to-end over a real exported artifact (slow tier).
# ---------------------------------------------------------------------------

def _post(url, data, ctype="application/octet-stream", timeout=120):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    from endoscopy_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path_factory.mktemp("serve_http_synth"))
    img_root, _, _, _ = make_synthetic_dataset(
        root, num_classes=4, n_train=16, n_valid=8, n_unlabeled=8,
        img_size=40)
    return img_root


@pytest.mark.slow
def test_http_server_end_to_end(dataset_root, tmp_path):
    import cv2

    from endoscopy_tpu.data.pipeline import (canonical_size,
                                             decode_canonical_bytes)
    from endoscopy_tpu.serve.export import export_model, load_exported
    from endoscopy_tpu.serve.server import make_server
    from tests.test_serve import _save_state, make_config

    cfg = make_config(dataset_root)
    canon = canonical_size(cfg)  # the artifact's input edge
    _, _, ckpt = _save_state(cfg, tmp_path / "cp")
    artifact = tmp_path / "model.jaxexport"
    export_model(cfg, ckpt, str(artifact), platforms=("cpu",))

    server = make_server(str(artifact), host="127.0.0.1", port=0,
                         buckets=(1, 2, 4), max_wait_ms=1,
                         log=lambda *_: None)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = _get(base + "/healthz")
        assert health["status"] == "ok"
        assert health["input_size"] == canon
        assert health["num_classes"] == 4
        assert health["buckets"] == [1, 2, 4]

        direct = load_exported(str(artifact))
        rng = np.random.default_rng(7)

        # raw canonical payload matches a direct artifact call
        img = rng.integers(0, 256, (canon, canon, 3), np.uint8)
        resp = _post(base + "/predict", img.tobytes())
        want = np.asarray(direct(img[None]))[0]
        np.testing.assert_allclose(resp["probs"], want, atol=1e-5)
        assert resp["pred"] == int(np.argmax(want))
        assert resp["max_prob"] == pytest.approx(float(want.max()), abs=1e-5)

        # encoded (PNG: lossless) payload goes through the canonical
        # cv2 decode and matches the offline decode of the same bytes
        ok, buf = cv2.imencode(".png", img[..., ::-1])  # RGB→BGR for cv2
        assert ok
        png = buf.tobytes()
        resp2 = _post(base + "/predict", png, ctype="image/png")
        dec = decode_canonical_bytes(png, canon)
        want2 = np.asarray(direct(dec[None]))[0]
        np.testing.assert_allclose(resp2["probs"], want2, atol=1e-5)

        # malformed payloads are 400s, not 500s
        for bad, ctype in [(b"x" * 7, "application/octet-stream"),
                           (b"not an image", "image/jpeg")]:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(base + "/predict", bad, ctype=ctype)
            assert ei.value.code == 400

        # concurrent requests coalesce into shared batches
        imgs = [rng.integers(0, 256, (canon, canon, 3), np.uint8)
                for _ in range(8)]
        server.batcher._max_wait_s = 0.5  # linger long enough to coalesce
        with ThreadPoolExecutor(8) as pool:
            results = list(pool.map(
                lambda im: _post(base + "/predict", im.tobytes()), imgs))
        for im, resp in zip(imgs, results):
            want = np.asarray(direct(im[None]))[0]
            np.testing.assert_allclose(resp["probs"], want, atol=1e-5)
        stats = _get(base + "/stats")
        assert stats["requests"] >= 10
        assert stats["batches"] < stats["requests"]
    finally:
        server.close()


def test_transport_tuning_pins():
    """Round-5 loopback isolation found two transport cliffs (docs/serving.md
    "HTTP server in isolation"): listen(5) SYN drops -> 1s kernel retries at
    p99, and Nagle holding the body segment for the delayed ACK (+40ms per
    keep-alive request). Pin both knobs so a refactor cannot silently
    reintroduce them."""
    from endoscopy_tpu.serve.server import ModelServer, _Handler

    assert ModelServer.request_queue_size >= 64
    assert _Handler.disable_nagle_algorithm is True
