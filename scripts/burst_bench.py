"""Serving burst benchmark orchestrator (one command, PERFORMANCE.md protocol).

Launches ``scripts/serve.py`` as a subprocess (the ONLY TPU-touching
process), waits for ``/healthz``, fires one warm-up request, runs the
``client.py`` burst load test against it, prints ONE JSON line with the
p50/p95/req-s table, and shuts the server down by PID. This is the
repeatable harness behind PERFORMANCE.md's serving burst numbers (the
reference has no serving path at all; bar: p95 <= 2x p50 under a
256-request burst at B=32 bf16).

Usage (run on the TPU box; nothing else may touch the TPU)::

    python scripts/burst_bench.py --config \
        configs/experiments/vggsound/avclip/9cb-viscond-avclip-channel_concat-llama.yaml \
        --batch 32 --requests 256 --concurrency 64 [--quantize cache]

The client side is pure HTTP (CPU): features are random ``[tv, cond_dim]``
read off the server's own ``/healthz`` contract, so the script needs no
dataset on disk.
"""

from __future__ import annotations

if __package__ in (None, ""):  # direct `python scripts/X.py` invocation
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

from scripts.client import generate, health, loadtest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--port", type=int, default=8807)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--quantize", default=None,
                    help="serve quantize mode (e.g. 'cache'); default bf16")
    ap.add_argument("--duration", type=float, default=2.56)
    ap.add_argument("--warmup-timeout", type=float, default=2400.0,
                    help="seconds to wait for the server's first compile")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra key=value serve.py overrides")
    args = ap.parse_args()

    url = f"http://127.0.0.1:{args.port}"
    cmd = [
        sys.executable, "scripts/serve.py",
        f"config={args.config}",
        f"port={args.port}", f"batch={args.batch}",
        f"duration={args.duration}",
        "quantize=" + (args.quantize or "false"),
        *args.extra,
    ]
    print("launching:", " ".join(cmd), file=sys.stderr, flush=True)
    log = open(f"/tmp/burst_serve_{args.port}.log", "wb")
    srv = subprocess.Popen(
        cmd, stdout=log, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        t0 = time.time()
        info = None
        while time.time() - t0 < args.warmup_timeout:
            if srv.poll() is not None:
                raise RuntimeError(
                    f"server exited rc={srv.returncode}; see {log.name}")
            try:
                info = health(url, timeout=5.0)
                break
            except Exception:
                time.sleep(5.0)
        if info is None:
            raise RuntimeError(f"server not healthy after "
                               f"{args.warmup_timeout:.0f}s; see {log.name}")
        t_health = time.time() - t0
        tv = int(info.get("max_feature_rows", 32))
        cond_dim = int(info.get("cond_dim", 768))
        feats = np.random.default_rng(0).standard_normal(
            (tv, cond_dim)).astype(np.float32)
        # one warm-up request: first batch may still pay compile/cache fill
        t0 = time.time()
        generate(url, feats, timeout=1800.0)
        t_warm = time.time() - t0

        stats = loadtest(
            url, feats, n_requests=args.requests,
            concurrency=args.concurrency,
        )
        dur = float(info.get("duration_s", args.duration))
        out = {
            "mode": args.quantize or "bf16",
            "batch": args.batch,
            "requests": args.requests,
            "concurrency": args.concurrency,
            "health_after_s": round(t_health, 1),
            "first_request_s": round(t_warm, 2),
            "audio_sec_per_s": round(stats["req_per_s"] * dur, 2),
            **stats,
        }
        print(json.dumps(out), flush=True)
    finally:
        if srv.poll() is None:
            srv.send_signal(signal.SIGINT)
            try:
                srv.wait(timeout=30)
            except subprocess.TimeoutExpired:
                srv.kill()
        log.close()


if __name__ == "__main__":
    main()
