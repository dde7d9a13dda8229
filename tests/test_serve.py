"""Serving front-end (scripts/serve.py): compiled-batch micro-batching
server over the tiny dummy config — health, WAV + codes responses,
concurrent request coalescing, input validation."""

import concurrent.futures
import io
import json
import threading
import urllib.error
import urllib.request
import wave
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def server():
    from scripts.serve import GenerationService, make_handler
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(
        batch=2, batch_buckets="1", duration=0.15, top_k=8, max_wait_ms=50,
        # tiny long-stream geometry (3 chunks within the 64-token block)
        stream_duration=0.6, stream_tokens=60, stream_stride_tokens=20,
        stream_max_tokens=30,
    )
    service = GenerationService(cfg)
    service.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()
    service.close(timeout=10)


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req).read()


def test_healthz(server):
    base, service = server
    info = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert info["status"] == "ok"
    assert info["batch"] == 2 and info["cond_dim"] == service.cond_dim


def test_concurrent_requests_coalesce_into_one_batch(server):
    base, service = server
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, service.cond_dim)).astype(np.float32)
    payload = {"features": feats.tolist()}
    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        f_wav = ex.submit(_post, base, "/generate", payload)
        f_codes = ex.submit(_post, base, "/generate?raw=codes", payload)
        wav_bytes, codes_bytes = f_wav.result(60), f_codes.result(60)
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getframerate() == service.sample_rate
        assert w.getnframes() > 0
    codes = json.loads(codes_bytes)["codes"]
    assert len(codes) == service.system.num_codebooks
    assert all(0 <= c <= service.system.special_token_id
               for row in codes for c in row)


def test_burst_double_buffered_batches_fill(server):
    """Under a burst larger than the batch, the double-buffered worker
    collects batch N+1 during batch N's compute, so every request is
    answered and the dispatched batches coalesce near capacity (the
    worker never degenerates to one-dispatch-per-request past the
    leading edge)."""
    base, service = server
    rng = np.random.default_rng(3)
    n = 8  # 4x the compiled batch of 2
    feats = [
        rng.standard_normal((4, service.cond_dim)).astype(np.float32)
        for _ in range(n)
    ]
    with service._metrics_lock:
        before = service._metrics["batches_total"]
    with concurrent.futures.ThreadPoolExecutor(n) as ex:
        futs = [
            ex.submit(_post, base, "/generate?raw=codes",
                      {"features": f.tolist()})
            for f in feats
        ]
        results = [f.result(120) for f in futs]
    assert len(results) == n
    for body in results:
        codes = json.loads(body)["codes"]
        assert len(codes) == service.system.num_codebooks
    with service._metrics_lock:
        batches = service._metrics["batches_total"] - before
    # perfect coalescing = n/batch = 4; allow the leading edge (first
    # request dispatches alone before the rest of the burst lands) and
    # scheduling jitter, but fail the no-coalescing regression (8)
    assert batches <= n - 1, f"burst of {n} dispatched {batches} batches"


def test_input_validation(server):
    base, service = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/generate", {"nope": 1})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/generate", {"features": [[0.0] * 7]})
    assert e.value.code == 400
    assert str(service.cond_dim) in e.value.read().decode()


@pytest.mark.slow
def test_quantize_gate(tmp_path):
    """serve quantize=true runs the int8-vs-bf16 agreement probe at
    startup and refuses when below quantize_min_agreement."""
    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=1, duration=0.15, quantize=True)
    # an impossible gate must refuse to serve
    cfg["quantize_min_agreement"] = 1.1
    with pytest.raises(RuntimeError, match="argmax agreement"):
        GenerationService(cfg)
    # gate off: service constructs and records the probe in the log
    cfg["quantize_min_agreement"] = 0.0
    svc = GenerationService(cfg)
    assert svc.system.sampler_config.quantize_weights


@pytest.mark.slow
def test_quantize_cache_mode(tmp_path):
    """serve quantize=cache: bf16 weights + int8 KV cache (the measured
    large-batch sweet spot — the cache, not the weights, is the HBM
    wall). Weights stay unquantized, the teacher-forced agreement gate
    is not armed, and a generation round-trips."""
    import jax
    import jax.numpy as jnp

    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=1, duration=0.15, quantize="cache")
    svc = GenerationService(cfg)
    try:
        assert svc.system.sampler_config.quantize_cache
        assert not svc.system.sampler_config.quantize_weights
        assert not svc._quantize  # reload path must NOT requantize params
        # bf16 weights really are bf16 (not int8 pairs)
        leaf = jax.tree.leaves(svc.params["sampler"])[0]
        assert leaf.dtype in (jnp.bfloat16, jnp.float32, jnp.int32)
        svc.start()
        feats = np.zeros((4, svc.cond_dim), np.float32)
        out = svc.submit(feats, want="codes")
        assert out.shape[0] == svc.system.num_codebooks
    finally:
        svc.close()


def test_fixed_conditioning_length(server):
    """The server pads every request to one fixed Tv (single compiled
    graph) and rejects longer feature sequences instead of recompiling
    (advisor r2: per-window max-tv padding recompiled per distinct Tv)."""
    base, service = server
    info = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert info["max_feature_rows"] == service.tv
    too_long = np.zeros((service.tv + 1, service.cond_dim), np.float32)
    with pytest.raises(ValueError, match="features too long"):
        service.submit(too_long)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/generate", {"features": too_long.tolist()})
    assert e.value.code in (400, 500)


def test_binary_npy_request(server):
    """application/octet-stream .npy bodies parse on the binary fast
    path and return the same WAV contract as JSON requests."""
    base, service = server
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((4, service.cond_dim)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, feats)
    req = urllib.request.Request(
        base + "/generate", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    wav_bytes = urllib.request.urlopen(req).read()
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getframerate() == service.sample_rate
        assert w.getnframes() > 0
    # wrong trailing dim still 400s on the binary path
    bad = io.BytesIO()
    np.save(bad, np.zeros((4, 7), np.float32))
    req = urllib.request.Request(
        base + "/generate", data=bad.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


@pytest.mark.slow
def test_generate_long_streams_wav_increments(server):
    """POST /generate_long returns a live WAV: unknown-length RIFF header
    then PCM increments per decoded chunk, close-delimited; total samples
    match the server's stream geometry, and a concurrent short request
    (exercising the worker's stream-exclusive hold) still completes."""
    import concurrent.futures

    base, service = server
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((1, 8, service.cond_dim)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, feats)
    req = urllib.request.Request(
        base + "/generate_long", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    short = rng.standard_normal((4, service.cond_dim)).astype(np.float32)
    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        f_stream = ex.submit(lambda: urllib.request.urlopen(req, timeout=600))
        f_short = ex.submit(_post, base, "/generate", {"features": short.tolist()})
        resp = f_stream.result(600)
        header = resp.read(44)
        assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
        assert header[36:40] == b"data"
        pcm = resp.read()
        wav_bytes = f_short.result(600)
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getnframes() > 0  # short path survived the stream
    hop = service.system.dac_config.hop_length
    assert len(pcm) // 2 == service.stream_tokens * hop
    audio = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32767.0
    assert np.abs(audio).max() <= 1.0 and np.abs(audio).max() > 0


def test_generate_long_rejects_bad_geometry(server):
    base, service = server
    bad = io.BytesIO()
    np.save(bad, np.zeros((3, 8, service.cond_dim), np.float32))  # S != 1
    req = urllib.request.Request(
        base + "/generate_long", data=bad.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


@pytest.mark.slow
def test_mesh_sharded_serving():
    """With >1 device and batch %% devices == 0 the service shards the
    compiled batch over the data mesh (8 virtual CPU devices from
    conftest), places params by the training partitioning rules, and
    serves the same request contract as single-chip."""
    import jax

    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    assert jax.device_count() == 8
    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=8, duration=0.15, top_k=8, max_wait_ms=10)
    svc = GenerationService(cfg)
    assert svc._batch_sharding is not None
    svc.start()
    feats = np.random.default_rng(7).standard_normal(
        (4, svc.cond_dim)
    ).astype(np.float32)
    codes = svc.submit(feats, want="codes")
    assert codes.shape[0] == svc.system.num_codebooks
    assert (codes >= 0).all() and (codes <= svc.system.special_token_id).all()

    # AOT artifacts are single-device: the combination is refused early
    with pytest.raises(ValueError, match="mutually exclusive"):
        GenerationService({**cfg, "aot_load": "nope.jaxexport"})


@pytest.mark.slow
def test_client_library(server, tmp_path):
    """scripts/client.py drives every endpoint: short WAV, codes, and the
    long stream (header + increments assemble to the geometry's sample
    count)."""
    from scripts import client

    base, service = server
    info = client.health(base)
    assert info["status"] == "ok"

    rng = np.random.default_rng(11)
    feats = rng.standard_normal((4, service.cond_dim)).astype(np.float32)
    wav_bytes = client.generate(base, feats)
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getnframes() > 0
    codes = client.generate(base, feats, want="codes")
    assert codes.shape[0] == service.system.num_codebooks

    seg = rng.standard_normal((1, 8, service.cond_dim)).astype(np.float32)
    stream = b"".join(client.generate_long_stream(base, seg))
    assert stream[:4] == b"RIFF"
    hop = service.system.dac_config.hop_length
    assert (len(stream) - 44) // 2 == service.stream_tokens * hop


@pytest.mark.slow
def test_video_b64_request_and_feature_normalization(tmp_path):
    """The video endpoint runs the visual encoder on [-1, 1]-normalized
    frames (mean/std 0.5 — the training transform contract; a bare /255
    scaling conditioned off-distribution), and too-short clips 400."""
    import base64

    from vaura_tpu.data import media

    if not media.available():
        pytest.skip("native media module unavailable")
    import jax.numpy as jnp

    from scripts.serve import GenerationService, make_handler
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=1, duration=0.64, top_k=8, max_wait_ms=10)
    service = GenerationService(cfg)

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(17, 224, 224, 3), dtype=np.uint8)
    path = tmp_path / "clip.mp4"
    media.write_video(path, frames.copy(), fps=25.0)
    video_bytes = path.read_bytes()

    feats = service.video_to_features(video_bytes)
    assert feats.shape == (8, service.cond_dim)

    # parity vs the training transform contract on the SAME decoded frames
    dec, _, _ = media.read_video(
        str(path), fps=25.0, duration=0.65, want_audio=False
    )
    x = (dec[:16].astype(np.float32) / 255.0 - 0.5) / 0.5
    x = x.transpose(3, 0, 1, 2).reshape(3, 1, 16, 224, 224)
    x = x.transpose(1, 0, 2, 3, 4)[None]
    want = np.asarray(
        service.system.visual_features(service.params, jnp.asarray(x))
    )[0]
    # bf16 compute: jitted-vs-eager rounding is ~1e-4; the [0,1]-scaling
    # bug this pins against shifts features by O(0.1)
    np.testing.assert_allclose(feats, want, atol=2e-3, rtol=0)

    # HTTP surface: video_b64 -> WAV; short clip -> 400
    service.start()
    import threading

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        wav_bytes = _post(
            base, "/generate",
            {"video_b64": base64.b64encode(video_bytes).decode()},
        )
        with wave.open(io.BytesIO(wav_bytes)) as w:
            assert w.getnframes() > 0
        short = tmp_path / "short.mp4"
        media.write_video(short, frames[:4].copy(), fps=25.0)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/generate",
                  {"video_b64": base64.b64encode(short.read_bytes()).decode()})
        assert e.value.code == 400
        assert "too short" in e.value.read().decode()
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_mesh_sharded_serving_quantized():
    """int8 weights + KV cache under mesh serving: quantized param trees
    (w_int8/scale leaves) still get shardings and the decode graph
    executes across the 8-device mesh."""
    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=8, duration=0.15, top_k=8, max_wait_ms=10,
               quantize=True)
    svc = GenerationService(cfg)
    assert svc._batch_sharding is not None
    assert svc.system.sampler_config.quantize_weights
    svc.start()
    feats = np.random.default_rng(9).standard_normal(
        (4, svc.cond_dim)
    ).astype(np.float32)
    codes = svc.submit(feats, want="codes")
    assert codes.shape[0] == svc.system.num_codebooks


def test_metrics_endpoint(server):
    base, service = server
    # force at least one served batch so counters are nonzero
    feats = np.zeros((4, service.cond_dim), np.float32)
    service.submit(feats, want="codes")
    text = urllib.request.urlopen(base + "/metrics").read().decode()
    vals = {
        line.split()[0]: float(line.split()[1])
        for line in text.splitlines() if not line.startswith("#")
    }
    assert vals["vaura_requests_total"] >= 1
    assert vals["vaura_batches_total"] >= 1
    assert 0 < vals["vaura_batch_fill_ratio"] <= 1
    assert vals["vaura_batch_seconds_avg"] > 0
    assert vals["vaura_inflight"] == 0
    assert vals["vaura_draining"] == 0
    assert vals["vaura_compiled_batch"] == service.batch


@pytest.mark.slow
def test_graceful_drain():
    """begin_drain: accepted work finishes, new work gets DrainingError
    (HTTP 503), drain() reports complete."""
    from scripts.serve import DrainingError, GenerationService, make_handler
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=1, duration=0.15, top_k=8, max_wait_ms=10)
    service = GenerationService(cfg)
    service.start()
    feats = np.zeros((4, service.cond_dim), np.float32)
    service.submit(feats, want="codes")  # warm, served

    service.begin_drain()
    with pytest.raises(DrainingError):
        service.submit(feats, want="codes")
    assert service.drain(timeout=10)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        info = json.loads(urllib.request.urlopen(base + "/healthz").read())
        assert info["status"] == "draining"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/generate", {"features": feats.tolist()})
        assert e.value.code == 503
    finally:
        httpd.shutdown()

    # close(): worker thread exits and the service is fully retired
    assert service.close(timeout=10)
    assert not service._worker.is_alive()
    assert service.close(timeout=1)  # idempotent


def test_hot_reload(server, tmp_path):
    """POST /reload hot-swaps serving weights between batches: same
    architecture, new checkpoint, no recompile. The int8/mesh variants
    share the same restore->cast->swap path tested here."""
    import orbax.checkpoint as ocp

    base, service = server
    # a converted-style checkpoint: the trainable subtrees with fresh
    # deterministic values (restore_trainable_params' first branch)
    rng = np.random.default_rng(7)

    def fresh(sds):
        if np.issubdtype(sds.dtype, np.floating):
            return rng.standard_normal(sds.shape).astype(sds.dtype)
        return np.zeros(sds.shape, sds.dtype)

    import jax

    tree = jax.tree.map(fresh, service._trainable_abstract)
    ckpt = (tmp_path / "reload_ckpt").resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt, tree)
        ckptr.wait_until_finished()

    def sampler_leaf(params):
        leaves = jax.tree.leaves(params["sampler"])
        return np.asarray(leaves[0]).ravel()[:4].copy()

    before = sampler_leaf(service.params)
    from scripts import client

    info = client.reload_weights(base, str(ckpt))
    assert info["reloaded"] and info["ckpt_path"] == str(ckpt)
    after = sampler_leaf(service.params)
    assert not np.allclose(before, after)

    # the swapped weights serve without recompiling (same shapes)
    feats = np.zeros((4, service.cond_dim), np.float32)
    codes = service.submit(feats, want="codes")
    assert codes.shape[0] == service.system.num_codebooks

    info = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert info["ckpt_path"] == str(ckpt)
    text = urllib.request.urlopen(base + "/metrics").read().decode()
    assert "vaura_reloads_total 1" in text

    # no startup checkpoint and no ckpt_path in the request -> 400
    service.ckpt_path = None
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/reload", {})
    assert e.value.code == 400
    assert "no checkpoint to reload" in e.value.read().decode()


@pytest.mark.slow
def test_hot_reload_quantized_gate_refusal(tmp_path):
    """A reload that fails the int8 agreement gate raises and keeps the
    CURRENT weights serving; a passing reload re-quantizes the new ones."""
    import jax
    import orbax.checkpoint as ocp

    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=1, duration=0.15, top_k=8, quantize=True,
               quantize_min_agreement=0.0)
    service = GenerationService(cfg)
    service.start()
    try:
        rng = np.random.default_rng(5)
        tree = jax.tree.map(
            lambda sds: (
                rng.standard_normal(sds.shape).astype(sds.dtype)
                if np.issubdtype(sds.dtype, np.floating)
                else np.zeros(sds.shape, sds.dtype)
            ),
            service._trainable_abstract,
        )
        ckpt = (tmp_path / "q_ckpt").resolve()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(ckpt, tree)
            ckptr.wait_until_finished()

        def leaf(params):
            return np.asarray(
                jax.tree.leaves(params["sampler"])[0]
            ).ravel()[:4].copy()

        before = leaf(service.params)
        # impossible gate: reload must refuse and keep the old weights
        service._quantize_min_agreement = 1.1
        with pytest.raises(RuntimeError, match="reload refused"):
            service.reload(str(ckpt))
        assert np.array_equal(before, leaf(service.params))
        assert service.ckpt_path is None  # unchanged

        # reachable gate: reload succeeds, params re-quantized (int8 dtype
        # preserved) and swapped
        service._quantize_min_agreement = 0.0
        info = service.reload(str(ckpt))
        assert info["reloaded"]
        assert not np.array_equal(before, leaf(service.params))
        dtypes = {
            np.asarray(x).dtype
            for x in jax.tree.leaves(service.params["sampler"])
        }
        assert np.dtype(np.int8) in dtypes
        feats = np.zeros((4, service.cond_dim), np.float32)
        codes = service.submit(feats, want="codes")
        assert codes.shape[0] == service.system.num_codebooks
    finally:
        service.close(timeout=10)


def test_batch_buckets(server):
    """A lone request dispatches on the smallest compiled bucket (B=1)
    instead of padding to the full batch; coalesced pairs use the full
    bucket; healthz and /metrics expose the bucket inventory."""
    base, service = server
    assert service.batch_buckets == [1, 2]
    info = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert info["batch_buckets"] == [1, 2]

    before = dict(service._bucket_counts)
    feats = np.zeros((4, service.cond_dim), np.float32)
    service.submit(feats, want="codes")  # lone request -> bucket 1
    assert service._bucket_counts[1] == before[1] + 1

    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        payload = {"features": feats.tolist()}
        f1 = ex.submit(_post, base, "/generate?raw=codes", payload)
        f2 = ex.submit(_post, base, "/generate?raw=codes", payload)
        f1.result(60), f2.result(60)
    assert service._bucket_counts[2] >= before[2] + 1

    text = urllib.request.urlopen(base + "/metrics").read().decode()
    assert 'vaura_bucket_batches_total{bucket="1"}' in text
    # fill ratio is against dispatched capacity, not the max batch
    vals = {
        line.split()[0]: float(line.split()[1])
        for line in text.splitlines()
        if not line.startswith("#") and "{" not in line
    }
    assert 0 < vals["vaura_batch_fill_ratio"] <= 1


def test_batch_buckets_parse():
    from scripts.serve import _parse_batch_buckets

    assert _parse_batch_buckets(None, 8) == [8]
    assert _parse_batch_buckets("1,4", 8) == [1, 4, 8]
    assert _parse_batch_buckets([1, 4], 8) == [1, 4, 8]
    # the CLI config overlay coerces "batch_buckets=1" to a bare int
    assert _parse_batch_buckets(1, 8) == [1, 8]
    with pytest.raises(ValueError, match="batch_buckets"):
        _parse_batch_buckets("16", 8)
    with pytest.raises(ValueError, match="batch_buckets"):
        _parse_batch_buckets("0,8", 8)


def test_batch_buckets_validation():
    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(batch=2, batch_buckets="3", duration=0.15)
    with pytest.raises(ValueError, match="batch_buckets"):
        GenerationService(cfg)
    cfg.update(batch_buckets="1", aot_load="x.jaxexport")
    with pytest.raises(ValueError, match="mutually"):
        GenerationService(cfg)


@pytest.mark.slow
def test_stream_mode_kv_service(tmp_path):
    """``stream_mode=kv`` serves /generate_long through the rolling-KV
    continuous decode (``generate_long_kv_stream``): the service raises
    the sampler's RoPE table to cover the stream horizon, and the
    streamed increments assemble to exactly the geometry's sample
    count."""
    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    cfg = dict(
        assemble_config(
            [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
            defaults_path=REPO / "configs" / "vaura_defaults.yaml",
            base_dir=REPO,
        )
    )
    cfg.update(
        batch=2, batch_buckets="1", duration=0.15, top_k=8, max_wait_ms=50,
        stream_duration=0.6, stream_tokens=60,
        stream_mode="kv", stream_chunk_steps=16, stream_window_chunks=2,
    )
    svc = GenerationService(cfg)
    try:
        assert svc.stream_mode == "kv"
        # horizon 60 + 64 headroom > the dummy block: table must be raised
        assert svc.system.sampler_config.block_size >= 60 + 64
        svc.start()
        feats = np.random.default_rng(3).standard_normal(
            (svc.stream_segments, svc.stream_t, svc.cond_dim)
        ).astype(np.float32)
        got = []
        svc.submit_stream(feats, got.append)
        assert len(got) >= 2  # streamed in pieces, not one flush
        hop = svc.system.dac_config.hop_length
        assert sum(a.shape[-1] for a in got) == svc.stream_tokens * hop
    finally:
        svc.close(timeout=10)

    with pytest.raises(ValueError, match="stream_mode"):
        GenerationService({**cfg, "stream_mode": "bogus"})
