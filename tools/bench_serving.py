"""Serving-path benchmark: exported-artifact inference on the local chip.

Times `serve.load_exported` calls (the deployment path: StableHLO artifact,
weights baked, symbolic batch) against the live jitted eval forward at
several batch sizes — per-call latency and img/s with device-resident
inputs (same convention as bench.py: the tunnel's host->device transfer is
not the chip's serving capability; see PERF.md tunnel note).

Usage: python tools/bench_serving.py [--model resnet50] [--img 112]
       [--batches 1,8,32] [--http] [--http-seconds 10] [--http-clients 32]

``--http`` additionally drives the full online path (cli.serve's
micro-batching HTTP server on localhost): closed-loop clients posting raw
canonical payloads, reporting achieved img/s, request-latency percentiles,
and the realized batch-fill from /stats. Includes host-side HTTP + batching
overhead on top of the chip number above it.

``--mock-ms X`` replaces the model with a fixed-latency mock (X ms per
batcher dispatch, any bucket) and runs ONLY the HTTP bench: the server's
own dispatch/batching overhead with both the tunnel AND the chip removed
(VERDICT r4 item 4). ``--mock-ms 0`` is the pure host dispatch ceiling.
No jax involved — runs anywhere, touches no TPU.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# repo root on sys.path regardless of CWD (run_parity.py pattern)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--img", type=int, default=112)
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--http", action="store_true",
                    help="also bench the online HTTP micro-batching server")
    ap.add_argument("--http-seconds", type=float, default=10.0)
    ap.add_argument("--http-clients", type=int, default=32)
    ap.add_argument("--int8", action="store_true",
                    help="also bench a weight-only int8 PTQ export of the "
                         "same model (A/B vs the full-precision artifact)")
    ap.add_argument("--mock-ms", type=float, default=None,
                    help="HTTP bench only, against a fixed-latency mock "
                         "model (isolates the batcher/dispatch path)")
    args = ap.parse_args()

    if args.mock_ms is not None:
        _bench_http(None, args.img, args.http_seconds, args.http_clients,
                    mock_ms=args.mock_ms)
        return

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from bench import _mk_cfg
    from endoscopy_tpu.data.pipeline import canonical_size
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.serve.export import make_infer_fn

    cfg = _mk_cfg(args.model, args.img, 32, 7, "None")
    size = canonical_size(cfg)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, size, size, 3), jnp.float32),
                           train=False)
    legs = [("f32/bf16", None)]
    if args.int8:
        legs.append(("int8-w", "int8"))

    blob = None
    for leg_name, quant in legs:
        infer = make_infer_fn(model, variables["params"],
                              variables.get("batch_stats", {}),
                              int(cfg.DATA.IMG_SIZE), jnp.bfloat16,
                              quantize=quant)

        # export with a symbolic batch (the deployment artifact), rehydrate
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.uint8)
        t0 = time.time()
        exported = jax_export.export(jax.jit(infer))(spec)
        leg_blob = exported.serialize()
        rehydrated = jax_export.deserialize(leg_blob)
        if blob is None:
            blob = leg_blob  # the HTTP bench serves the full-precision leg
        print(f"[{leg_name}] artifact: {len(leg_blob) / 1e6:.1f} MB, "
              f"export {time.time()-t0:.0f}s", flush=True)

        # The relay caches repeat executions with identical inputs (PERF.md);
        # stage DISTINCT device-resident batches and rotate through them so
        # every timed call is a real execution.
        rng = np.random.default_rng(0)
        for bs in [int(x) for x in args.batches.split(",")]:
            batches = [
                jnp.asarray(
                    rng.integers(0, 255, (bs, size, size, 3)).astype(np.uint8))
                for _ in range(args.calls + 1)
            ]
            # warmup/compile on a batch NOT in the timed set (a replay would
            # be a relay cache hit)
            out = rehydrated.call(batches.pop())
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            outs = [rehydrated.call(b) for b in batches]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / args.calls
            print(f"[{leg_name}] B={bs:3d}: {dt * 1e3:7.2f} ms/call, "
                  f"{bs / dt:9.0f} img/s", flush=True)

    if args.http:
        _bench_http(blob, size, args.http_seconds, args.http_clients)


def _bench_http(blob, size: int, seconds: float, clients: int,
                mock_ms: float | None = None) -> None:
    """Closed-loop load against the real cli.serve stack on localhost.

    mock_ms != None swaps the exported model for a busy-sleep of that many
    milliseconds per dispatch: the full HTTP handler + BucketBatcher path
    with a deterministic "chip", so throughput/latency/fill attribute to
    the host stack alone."""
    import json
    import tempfile
    import threading
    import time as _time
    import urllib.request

    from endoscopy_tpu.serve.server import ModelServer, make_server

    if mock_ms is not None:
        ncls = 6

        def mock_infer(batch):
            if mock_ms > 0:
                _time.sleep(mock_ms / 1e3)
            return np.tile(np.linspace(0.9, 0.1, ncls, dtype=np.float32),
                           (batch.shape[0], 1))

        server = ModelServer(("127.0.0.1", 0), mock_infer, input_size=size,
                             num_classes=ncls, buckets=(1, 2, 4, 8, 16, 32),
                             max_wait_ms=2.0, backend=f"mock({mock_ms}ms)")
        print(f"mock model: {mock_ms} ms per dispatch, any bucket",
              flush=True)
    else:
        with tempfile.NamedTemporaryFile(suffix=".jaxexport") as f:
            f.write(blob)
            f.flush()
            server = make_server(f.name, host="127.0.0.1", port=0,
                                 max_wait_ms=2.0, log=lambda *_: None)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(1)
    payloads = [rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
                .tobytes() for _ in range(64)]

    lat: list = []
    stop = _time.monotonic() + seconds
    lock = threading.Lock()

    def client(i: int) -> None:
        # keep-alive: one TCP connection per client, like any production
        # client library. Per-request connections (urllib) measure the TCP
        # handshake path instead of the server — with enough clients the
        # listen backlog overflows and kernel SYN retries (1s) own the p99.
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        k = i
        try:
            while _time.monotonic() < stop:
                t0 = _time.perf_counter()
                conn.request(
                    "POST", "/predict", body=payloads[k % len(payloads)],
                    headers={"Content-Type": "application/octet-stream"})
                resp = conn.getresponse()
                resp.read()
                if resp.status != 200:
                    raise RuntimeError(f"HTTP {resp.status}")
                with lock:
                    lat.append(_time.perf_counter() - t0)
                k += clients
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    t0 = _time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=seconds + 120)
    wall = _time.monotonic() - t0
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    server.close()
    lat.sort()
    n = len(lat)
    if n == 0:
        print("HTTP: no requests completed", flush=True)
        return
    print(f"HTTP ({clients} closed-loop clients, {wall:.1f}s): "
          f"{n / wall:8.0f} img/s end-to-end, "
          f"p50 {lat[n // 2] * 1e3:.1f} ms, "
          f"p90 {lat[int(n * 0.90)] * 1e3:.1f} ms, "
          f"p99 {lat[int(n * 0.99)] * 1e3:.1f} ms, "
          f"mean batch fill {stats['mean_fill']:.2f}, "
          f"buckets {stats['bucket_hist']}, "
          f"model-call p50/p99 {stats['model_ms_p50']:.1f}/"
          f"{stats['model_ms_p99']:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
