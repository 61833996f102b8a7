"""Serving daemon: HTTP API over the pipeline (cli/serve.py).

Spins a real ThreadingHTTPServer on a loopback port with a tiny random-init
pipeline and drives it with urllib: health, one-off episodes (shot padding),
support-cache lifecycle (create / segment / evict / delete), batching
limits, error paths, and parity of the served masks with direct pipeline
calls.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest
from PIL import Image

from diffews_tpu import checkpoint as C
from diffews_tpu.cli import serve
from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.data.transforms import ImageTransform, nearest_resize_mask
from diffews_tpu.models import unet, vae
from diffews_tpu.pipeline import DiffewsPipeline

S = 32  # server img_size (tiny configs)


def _b64_png(arr: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _rgb(seed, h=40, w=48):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def _mask(seed, h=40, w=48):
    m = np.zeros((h, w), np.uint8)
    r = np.random.default_rng(seed)
    y, x = int(r.integers(0, h // 2)), int(r.integers(0, w // 2))
    m[y:y + h // 2, x:x + w // 2] = 255
    return m


@pytest.fixture(scope="module")
def pipe():
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)), ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)), vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    return DiffewsPipeline(bundle)


@pytest.fixture(scope="module")
def server(pipe):
    ms = serve.ModelServer(pipe=pipe, bsz=2, nshot=2, img_size=S,
                           r_threshold=0.25, max_caches=2, model_desc="tiny")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(ms))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", ms
    httpd.shutdown()
    httpd.server_close()


def _call(base, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    base, _ = server
    status, body = _call(base, "GET", "/healthz")
    assert status == 200 and body["ok"] and body["mode"] == "pipeline"
    assert body["bsz"] == 2 and body["nshot"] == 2


def test_one_off_episode_matches_direct_pipeline(server, pipe):
    base, _ = server
    q, s, m = _rgb(1), _rgb(2), _mask(3)
    status, body = _call(base, "POST", "/v1/segment", {
        "query": _b64_png(q), "supports": [_b64_png(s)],
        "masks": [_b64_png(m)], "return_seg": True})
    assert status == 200, body
    got = np.asarray(Image.open(io.BytesIO(base64.b64decode(body["masks"][0]))))
    assert got.shape == (40, 48) and set(np.unique(got)) <= {0, 255}

    # direct pipeline call with the same preprocessing = same mask
    tf = ImageTransform(S, raw=True)
    qb = np.stack([tf(Image.fromarray(q))] * 2)
    sb = np.broadcast_to(
        np.stack([tf(Image.fromarray(s))] * 2)[:, None], (2, 2, S, S, 3))
    mm = nearest_resize_mask((m >= 128).astype(np.float32), (S, S))
    mb = np.broadcast_to(mm[None, None], (2, 2, S, S))
    shot_mask = np.zeros((2, 2), bool)
    shot_mask[:, :1] = True
    out = pipe.predict(qb, sb, mb, shot_mask=shot_mask, r_threshold=0.25)
    want = nearest_resize_mask(out.mask[0].astype(np.float32), (40, 48))
    np.testing.assert_array_equal(got > 0, want > 0)


def test_cache_lifecycle_and_parity(server):
    base, ms = server
    s, m = _rgb(4), _mask(5)
    status, body = _call(base, "POST", "/v1/supports",
                         {"images": [_b64_png(s)], "masks": [_b64_png(m)]})
    assert status == 200 and body["n_shots"] == 1
    cid = body["cache_id"]

    q1, q2 = _rgb(6), _rgb(7, h=30, w=30)
    status, got = _call(base, "POST", "/v1/segment",
                        {"query": [_b64_png(q1), _b64_png(q2)],
                         "cache_id": cid})
    assert status == 200, got
    m1 = np.asarray(Image.open(io.BytesIO(base64.b64decode(got["masks"][0]))))
    m2 = np.asarray(Image.open(io.BytesIO(base64.b64decode(got["masks"][1]))))
    assert m1.shape == (40, 48) and m2.shape == (30, 30)

    # cached result == one-off episode result for the same inputs
    status, oneoff = _call(base, "POST", "/v1/segment", {
        "query": _b64_png(q1), "supports": [_b64_png(s)],
        "masks": [_b64_png(m)]})
    assert status == 200
    direct = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(oneoff["masks"][0]))))
    # uint8-quantization boundary pixels may flip (pipeline docstring);
    # demand near-identity
    assert np.mean(m1 != direct) < 0.02

    status, _ = _call(base, "DELETE", f"/v1/supports/{cid}")
    assert status == 200
    status, err = _call(base, "POST", "/v1/segment",
                        {"query": _b64_png(q1), "cache_id": cid})
    assert status == 404 and "unknown cache_id" in err["error"]


def test_cache_fifo_eviction(server):
    base, ms = server
    ids = []
    for i in range(3):  # max_caches=2
        _, body = _call(base, "POST", "/v1/supports",
                        {"images": [_b64_png(_rgb(10 + i))],
                         "masks": [_b64_png(_mask(20 + i))]})
        ids.append(body["cache_id"])
    assert len(ms._caches) == 2
    assert ids[0] not in ms._caches and ids[2] in ms._caches


def test_error_paths(server):
    base, _ = server
    status, err = _call(base, "POST", "/v1/segment", {})
    assert status == 400 and "query" in err["error"]
    status, err = _call(base, "POST", "/v1/segment",
                        {"query": _b64_png(_rgb(0))})
    assert status == 400 and "cache_id" in err["error"]
    status, err = _call(base, "POST", "/v1/segment",
                        {"query": [_b64_png(_rgb(0))] * 3,
                         "supports": [_b64_png(_rgb(1))],
                         "masks": [_b64_png(_mask(2))]})
    assert status == 400 and "split the request" in err["error"]
    status, err = _call(base, "POST", "/v1/segment",
                        {"query": "not-base64-png!!", "cache_id": "x"})
    assert status == 400
    status, err = _call(base, "GET", "/nope")
    assert status == 404
    # bad JSON body
    req = urllib.request.Request(base + "/v1/segment", data=b"{oops",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_concurrent_requests(server):
    """Concurrent segments serialize on the device lock without error."""
    base, _ = server
    payload = {"query": _b64_png(_rgb(30)),
               "supports": [_b64_png(_rgb(31))],
               "masks": [_b64_png(_mask(32))]}
    results = []

    def go():
        results.append(_call(base, "POST", "/v1/segment", payload))

    threads = [threading.Thread(target=go) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert all(s == 200 for s, _ in results)
    first = results[0][1]["masks"][0]
    assert all(r["masks"][0] == first for _, r in results)


def test_artifact_mode(pipe, tmp_path):
    """The daemon serves an AOT StableHLO artifact with no model code."""
    from diffews_tpu import serving

    out_dir = serving.save_serving_artifact(
        pipe, str(tmp_path / "art"), bsz=2, nshot=1, img_size=S)
    mod = serving.load(out_dir)
    ms = serve.ModelServer(artifact=mod, bsz=mod.manifest["bsz"],
                           nshot=mod.manifest["nshot"], img_size=S,
                           r_threshold=0.25, model_desc="artifact")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(ms))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, body = _call(base, "GET", "/healthz")
        assert status == 200 and body["mode"] == "artifact"
        status, err = _call(base, "POST", "/v1/supports",
                            {"images": [_b64_png(_rgb(1))],
                             "masks": [_b64_png(_mask(2))]})
        assert status == 400 and "artifact mode" in err["error"]
        status, got = _call(base, "POST", "/v1/segment", {
            "query": _b64_png(_rgb(3)), "supports": [_b64_png(_rgb(4))],
            "masks": [_b64_png(_mask(5))]})
        assert status == 200, got
        m = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(got["masks"][0]))))
        assert m.shape == (40, 48) and set(np.unique(m)) <= {0, 255}
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_zero_threshold_and_bad_values(server):
    """Client-controlled degenerate values get 400s, not 500s."""
    base, _ = server
    ep = {"query": _b64_png(_rgb(50)), "supports": [_b64_png(_rgb(51))],
          "masks": [_b64_png(_mask(52))]}
    status, err = _call(base, "POST", "/v1/segment",
                        {**ep, "r_threshold": 0})
    assert status == 400 and "no mask" in err["error"]
    status, got = _call(base, "POST", "/v1/segment",
                        {**ep, "r_threshold": 0, "return_seg": True})
    assert status == 200 and "masks" not in got and len(got["seg"]) == 1
    # seg comes back at the query's original geometry, like masks
    seg = np.asarray(Image.open(io.BytesIO(base64.b64decode(got["seg"][0]))))
    assert seg.shape == (40, 48, 3)
    status, err = _call(base, "POST", "/v1/segment",
                        {**ep, "r_threshold": "abc"})
    assert status == 400 and "threshold" in err["error"]
    # truncated image payload -> 400 (PIL decodes lazily; forced early)
    png = base64.b64decode(_b64_png(_rgb(53)))
    status, err = _call(base, "POST", "/v1/segment",
                        {**ep, "query": base64.b64encode(
                            png[:len(png) // 2]).decode()})
    assert status == 400 and "image payload" in err["error"]
    # non-dict JSON body -> 400
    req = urllib.request.Request(base + "/v1/segment", data=b"[1,2]",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_micro_batching_coalesces_concurrent_requests(pipe):
    """batch_window_ms > 0: concurrent single-query cached requests share
    device calls; per-item thresholds still apply; results match the
    unbatched server exactly."""
    ms = serve.ModelServer(pipe=pipe, bsz=2, nshot=1, img_size=S,
                           r_threshold=0.25, batch_window_ms=1000,
                           model_desc="tiny")
    direct = serve.ModelServer(pipe=pipe, bsz=2, nshot=1, img_size=S,
                               r_threshold=0.25, model_desc="tiny")
    sup, msk = _rgb(60), _mask(61)
    body = {"images": [_b64_png(sup)], "masks": [_b64_png(msk)]}
    cid = ms.add_supports(body)["cache_id"]
    cid_d = direct.add_supports(body)["cache_id"]

    calls = []
    real = pipe.predict_cached_async  # both serve paths dispatch async

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    pipe.predict_cached_async = counting
    try:
        queries = [_rgb(70 + i) for i in range(4)]
        thresholds = [{"r_threshold": 0.25}, {"r_threshold": 0.5},
                      {"threshold": 0.4}, {"r_threshold": 0.25}]
        results = [None] * 4
        barrier = threading.Barrier(4)

        def go(i):
            barrier.wait()
            results[i] = ms.segment({"query": _b64_png(queries[i]),
                                     "cache_id": cid, **thresholds[i]})

        threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        n_batched_calls = len(calls)
        # 4 requests at bsz 2 coalesce to 2 device calls when all four make
        # the leader's window; a thread descheduled past the window elects
        # itself a new leader, so on a loaded machine 3 calls are possible.
        # The invariant under test is coalescing-happened (< 4), not an
        # exact schedule.
        assert n_batched_calls < 4

        for i in range(4):
            want = direct.segment({"query": _b64_png(queries[i]),
                                   "cache_id": cid_d, **thresholds[i]})
            assert results[i]["masks"] == want["masks"]
        assert len(calls) == n_batched_calls + 4  # direct made 4 calls
    finally:
        pipe.predict_cached_async = real


def test_micro_batching_surfaces_errors(pipe):
    """A mid-flight cache eviction fails queued waiters with the 404."""
    ms = serve.ModelServer(pipe=pipe, bsz=2, nshot=1, img_size=S,
                           r_threshold=0.25, batch_window_ms=400,
                           model_desc="tiny")
    cid = ms.add_supports({"images": [_b64_png(_rgb(80))],
                           "masks": [_b64_png(_mask(81))]})["cache_id"]
    errors = []
    barrier = threading.Barrier(3)

    def go():
        barrier.wait()
        try:
            ms.segment({"query": _b64_png(_rgb(82)), "cache_id": cid})
        except serve.ServeError as e:
            errors.append(e.status)

    threads = [threading.Thread(target=go) for _ in range(2)]
    [t.start() for t in threads]
    barrier.wait()          # all queued inside the window...
    ms.drop_supports(cid)   # ...then the cache disappears
    [t.join() for t in threads]
    assert errors == [404, 404]


def test_stats_endpoint(server):
    """/v1/stats reflects request counts, errors, and device accounting."""
    base, ms = server
    _call(base, "GET", "/healthz")
    status, err = _call(base, "POST", "/v1/segment", {})  # 400: no query
    assert status == 400
    _call(base, "POST", "/v1/segment", {
        "query": _b64_png(_rgb(90)), "supports": [_b64_png(_rgb(91))],
        "masks": [_b64_png(_mask(92))]})

    status, stats = _call(base, "GET", "/v1/stats")
    assert status == 200
    eps = stats["endpoints"]
    assert eps["healthz"]["count"] >= 1 and eps["healthz"]["errors"] == 0
    seg = eps["segment"]
    assert seg["count"] >= 2 and seg["errors"] >= 1
    assert seg["p50_ms"] <= seg["p99_ms"]
    assert 0 < seg["mean_ms"]
    assert stats["queries"] >= 1
    assert stats["device_calls"] >= 1 and stats["device_s"] > 0
    assert stats["uptime_s"] > 0


def test_data_parallel_serving_matches_unsharded(pipe):
    """A ('data',) mesh server returns the same masks as the unsharded one
    (the multi-chip serving configuration: --num_data_shards)."""
    from diffews_tpu.parallel.mesh import make_mesh

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)), ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)), vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    dp_pipe = DiffewsPipeline(bundle, mesh=make_mesh(n_data=2))
    body = {"query": _b64_png(_rgb(60)), "supports": [_b64_png(_rgb(61))],
            "masks": [_b64_png(_mask(62))]}
    ms_dp = serve.ModelServer(pipe=dp_pipe, bsz=2, nshot=2, img_size=S,
                              r_threshold=0.25, model_desc="tiny-dp")
    ms_1 = serve.ModelServer(pipe=pipe, bsz=2, nshot=2, img_size=S,
                             r_threshold=0.25, model_desc="tiny")
    got, want = ms_dp.segment(dict(body)), ms_1.segment(dict(body))
    assert got["masks"] == want["masks"]
    assert "data=2" in ms_dp.healthz()["mesh"]


def test_shot_parallel_server_rejects_cache(pipe):
    """--num_shot_shards serving: one-off episodes work, /v1/supports 400s
    (the support-KV cache cannot compose with the cross-chip merge)."""
    from diffews_tpu.parallel.mesh import make_shot_mesh

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)), ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)), vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    sp_pipe = DiffewsPipeline(bundle, shot_mesh=make_shot_mesh(2))
    ms = serve.ModelServer(pipe=sp_pipe, bsz=2, nshot=2, img_size=S,
                           r_threshold=0.25, model_desc="tiny-sp")
    with pytest.raises(serve.ServeError) as ei:
        ms.add_supports({"images": [_b64_png(_rgb(70))],
                         "masks": [_b64_png(_mask(71))]})
    assert ei.value.status == 400 and "shot-parallel" in str(ei.value)
    # one-off episodes at the sharded shot count still serve; the seg
    # payload matches unsharded within the uint8 round-trip (the
    # log-sum-exp merge is exact math but not bitwise — same tolerance
    # as tests/test_shot_parallel.py's pipeline-level checks)
    body = {"query": _b64_png(_rgb(72)), "return_seg": True,
            "supports": [_b64_png(_rgb(73)), _b64_png(_rgb(74))],
            "masks": [_b64_png(_mask(75)), _b64_png(_mask(76))]}
    out = ms.segment(dict(body))
    assert out["masks"]
    ms_1 = serve.ModelServer(pipe=pipe, bsz=2, nshot=2, img_size=S,
                             r_threshold=0.25, model_desc="tiny")
    want = ms_1.segment(dict(body))

    def _decode(b64):
        return np.asarray(
            Image.open(io.BytesIO(base64.b64decode(b64))), dtype=np.int32)

    np.testing.assert_allclose(_decode(out["seg"][0]),
                               _decode(want["seg"][0]), atol=1)


def test_make_server_mesh_flag_validation():
    """Divisibility checks fire before any checkpoint is touched."""
    args = serve.build_parser().parse_args(
        ["--checkpoint", "/nonexistent", "--bsz", "3",
         "--num_data_shards", "2"])
    with pytest.raises(SystemExit):
        serve.make_server(args)
    args = serve.build_parser().parse_args(
        ["--checkpoint", "/nonexistent", "--nshot", "3",
         "--num_shot_shards", "2"])
    with pytest.raises(SystemExit):
        serve.make_server(args)


def test_pipelined_dispatch_depth1_no_deadlock_and_slot_release(pipe):
    """The in-flight semaphore: a failing dispatch releases its slot, and
    depth 1 under concurrent cached + one-off + micro-batched requests
    still completes every request (a leaked slot or a leader holding a
    slot while blocking would hang the server)."""
    ms = serve.ModelServer(pipe=pipe, bsz=2, nshot=2, img_size=S,
                           r_threshold=0.25, batch_window_ms=20.0,
                           dispatch_depth=1, model_desc="tiny-d1")
    # failing dispatches (unknown cache) must release their slot
    for _ in range(3):
        with pytest.raises(serve.ServeError):
            ms.segment({"query": _b64_png(_rgb(80)), "cache_id": "nope"})
    cid = ms.add_supports({"images": [_b64_png(_rgb(81))],
                           "masks": [_b64_png(_mask(82))]})["cache_id"]
    results, errors = [], []

    def cached(k):
        try:
            results.append(ms.segment(
                {"query": _b64_png(_rgb(83 + k)), "cache_id": cid}))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def oneoff(k):
        try:
            results.append(ms.segment(
                {"query": _b64_png(_rgb(90 + k)),
                 "supports": [_b64_png(_rgb(91 + k))],
                 "masks": [_b64_png(_mask(92 + k))]}))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=cached, args=(k,)) for k in range(4)]
    threads += [threading.Thread(target=oneoff, args=(k,)) for k in range(2)]
    [t.start() for t in threads]
    [t.join(timeout=300) for t in threads]
    assert not any(t.is_alive() for t in threads), "server deadlocked"
    assert not errors, errors
    assert len(results) == 6 and all(r["masks"] for r in results)
    # every slot returned: one more request goes straight through
    out = ms.segment({"query": _b64_png(_rgb(99)), "cache_id": cid})
    assert out["masks"]


def _raw_entry(arr: np.ndarray) -> dict:
    return {"raw": base64.b64encode(np.ascontiguousarray(arr).tobytes())
            .decode("ascii"), "shape": list(arr.shape)}


def test_raw_tensor_ingestion_matches_png(server):
    """Raw uint8 tensor entries (codec-free ingestion) produce the same
    masks as the identical images sent as PNG, for one-off episodes and
    the support-cache path; malformed raw entries 400."""
    base, ms = server
    q, sup = _rgb(120), _rgb(121)
    msk = _mask(122)
    png_body = {"query": _b64_png(q), "supports": [_b64_png(sup)],
                "masks": [_b64_png(msk)]}
    raw_body = {"query": _raw_entry(q), "supports": [_raw_entry(sup)],
                "masks": [_raw_entry((msk >= 128).astype(np.uint8))]}
    s_png, want = _call(base, "POST", "/v1/segment", png_body)
    s_raw, got = _call(base, "POST", "/v1/segment", raw_body)
    assert s_png == 200 and s_raw == 200
    assert got["masks"] == want["masks"]

    # supports registered raw serve queries identically to PNG supports
    s1, c_png = _call(base, "POST", "/v1/supports",
                      {"images": [_b64_png(sup)], "masks": [_b64_png(msk)]})
    s2, c_raw = _call(base, "POST", "/v1/supports",
                      {"images": [_raw_entry(sup)],
                       "masks": [_raw_entry((msk >= 128).astype(np.uint8))]})
    assert s1 == 200 and s2 == 200
    _, m_png = _call(base, "POST", "/v1/segment",
                     {"query": _b64_png(q), "cache_id": c_png["cache_id"]})
    _, m_raw = _call(base, "POST", "/v1/segment",
                     {"query": _raw_entry(q), "cache_id": c_raw["cache_id"]})
    assert m_raw["masks"] == m_png["masks"]

    # raw masks accept 0/255 too (nonzero = foreground)
    s3, got255 = _call(base, "POST", "/v1/segment",
                       {**raw_body, "masks": [_raw_entry(msk)]})
    assert s3 == 200 and got255["masks"] == want["masks"]


def test_body_size_limit_and_bad_content_length(server):
    """Bodies above --max_body_mb 413 BEFORE being read; negative
    Content-Length 400s instead of read(-1)-blocking until EOF."""
    import http.client

    base, ms = server
    host = base[len("http://"):]
    old = ms.max_body_bytes
    ms.max_body_bytes = 100
    try:
        # oversize declared length: rejected from the header alone (the
        # connection closes unread, so only claim 1 MB, never send it)
        conn = http.client.HTTPConnection(host, timeout=60)
        conn.putrequest("POST", "/v1/segment")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(1 << 20))
        conn.endheaders()
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 413, body
        assert "max_body_mb" in body["error"]
        # the unread body means this connection dies: a keep-alive client
        # must be told not to pool it
        assert resp.getheader("Connection") == "close"
        conn.close()

        # within the limit still works
        status, body = _call(base, "POST", "/v1/segment", {"query": []})
        assert status == 400 and "query" in body["error"]
    finally:
        ms.max_body_bytes = old

    conn = http.client.HTTPConnection(host, timeout=60)
    conn.putrequest("POST", "/v1/segment", skip_accept_encoding=True)
    conn.putheader("Content-Length", "-5")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_raw_response_encoding_matches_png(server):
    """encoding=raw returns masks/seg as raw tensor objects whose pixels
    equal the decoded PNG response; unknown encodings 400 BEFORE any
    device work runs (no query/device-call accounting)."""
    base, ms = server
    body = {"query": _b64_png(_rgb(130)), "supports": [_b64_png(_rgb(131))],
            "masks": [_b64_png(_mask(132))], "return_seg": True}
    s1, png_resp = _call(base, "POST", "/v1/segment", body)
    s2, raw_resp = _call(base, "POST", "/v1/segment",
                         {**body, "encoding": "raw"})
    assert s1 == 200 and s2 == 200
    for key in ("masks", "seg"):
        want = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(png_resp[key][0]))))
        ent = raw_resp[key][0]
        got = np.frombuffer(base64.b64decode(ent["raw"]), np.uint8).reshape(
            ent["shape"])
        assert np.array_equal(got, want), key

    before = ms.stats_snapshot()
    s3, err = _call(base, "POST", "/v1/segment", {**body, "encoding": "jpg"})
    assert s3 == 400, err
    after = ms.stats_snapshot()
    # the rejection must cost nothing: no episode dispatched, no queries
    # counted (a retrying misconfigured client must not burn device time)
    assert after["device_calls"] == before["device_calls"]
    assert after["queries"] == before["queries"]


def test_raw_tensor_validation(server):
    base, _ = server
    good_q = _raw_entry(_rgb(123))
    for bad in [
        {"raw": "aGk=", "shape": [40, 48, 3]},       # byte-count mismatch
        {"raw": "aGk=", "shape": [40, 48]},          # image must be HW3
        {"shape": [40, 48, 3]},                      # missing raw
        {"raw": "!!!", "shape": [2, 2, 3]},          # undecodable b64
        {"raw": "aGkh", "shape": [-1, -1, 3]},       # -1 dims pass np.prod
        {"raw": "", "shape": [0, 0, 3]},             # 0-size reshapes fine
    ]:
        status, body = _call(base, "POST", "/v1/segment",
                             {"query": bad, "supports": [good_q],
                              "masks": [_raw_entry(_mask(124)[:, :] // 255)]})
        assert status == 400, body


def test_sigterm_graceful_drain(tmp_path):
    """A real `python -m diffews_tpu.cli.serve` process: SIGTERM mid-request
    finishes the in-flight work (200 response), then exits 0 after
    draining (the kubernetes/systemd stop contract)."""
    import os
    import signal as sig
    import subprocess
    import sys
    import time as _t

    ck = tmp_path / "ckpt"
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    C.save_unet(jax.jit(lambda r: unet.init_params(r, ucfg))(
        jax.random.PRNGKey(0)), ucfg, str(ck / "unet"))
    C.save_vae(jax.jit(lambda r: vae.init_params(r, vcfg))(
        jax.random.PRNGKey(1)), vcfg, str(ck / "vae"))
    from diffews_tpu.models import clip_text
    tp = clip_text.init_params(jax.random.PRNGKey(2), CLIPTextConfig.tiny())
    state = {"text_model." + k: v
             for k, v in C.pytree_to_torch_state(tp).items()}
    C.save_torch_weights(state, str(ck / "text_encoder"), C.TEXT_SAFETENSORS)
    import json as _json
    with open(ck / "text_encoder" / "config.json", "w") as f:
        _json.dump({"vocab_size": 1000, "hidden_size": 32,
                    "intermediate_size": 64, "num_hidden_layers": 2,
                    "num_attention_heads": 4}, f)
    (ck / "scheduler").mkdir()
    with open(ck / "scheduler" / "scheduler_config.json", "w") as f:
        _json.dump(SchedulerConfig.diffews().to_diffusers_dict(), f)

    proc = subprocess.Popen(
        [sys.executable, "-m", "diffews_tpu.cli.serve", "--checkpoint",
         str(ck), "--platform", "cpu", "--port", "0", "--bsz", "1",
         "--nshot", "1", "--img-size", str(S)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        # startup may emit warnings (JAX/absl notices vary by version)
        # before the banner: scan a bounded number of lines for it
        line, seen = "", []
        for _ in range(50):
            line = proc.stdout.readline()
            seen.append(line)
            if not line or "serving on http://" in line:
                break
        assert "serving on http://" in line, seen
        base = line.split()[2]

        results = []

        def segment():
            results.append(_call(base, "POST", "/v1/segment",
                                 {"query": _b64_png(_rgb(200)),
                                  "supports": [_b64_png(_rgb(201))],
                                  "masks": [_b64_png(_mask(202))]}))

        t = threading.Thread(target=segment)
        t.start()
        _t.sleep(1.0)  # request in flight (tiny-config compile takes >1 s)

        # an idle connection that never sends a request: its handler
        # thread is parked in readline(); the drain must not join it
        # forever (the Handler socket timeout bounds it)
        import socket as _socket
        host, port = base[len("http://"):].split(":")
        idle = _socket.create_connection((host, int(port)))

        proc.send_signal(sig.SIGTERM)
        t.join(timeout=600)
        assert results and results[0][0] == 200, results
        out, _ = proc.communicate(timeout=600)
        idle.close()
        assert proc.returncode == 0, out
        assert "drained and stopped" in out, out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()


def test_batch_buckets_match_full_padding(pipe):
    """--batch_buckets: partial batches pad to the smallest bucket instead
    of bsz; results must equal the always-pad-to-bsz server (same math —
    the cached-episode program is batch-independent per row; note the
    <=1-uint8-step VAE fusion caveat applies to SEG images, but masks on
    the tiny CPU configs compare equal here)."""
    msb = serve.ModelServer(pipe=pipe, bsz=4, nshot=1, img_size=S,
                            r_threshold=0.25, model_desc="tiny",
                            batch_buckets="1,2")
    msf = serve.ModelServer(pipe=pipe, bsz=4, nshot=1, img_size=S,
                            r_threshold=0.25, model_desc="tiny")
    assert msb.buckets == [1, 2, 4]
    body = {"images": [_b64_png(_rgb(90))], "masks": [_b64_png(_mask(91))]}
    cidb = msb.add_supports(body)["cache_id"]
    cidf = msf.add_supports(body)["cache_id"]
    for nq in (1, 2, 3, 4):
        q = np.stack([_rgb(95 + i) for i in range(nq)])
        # _pad_batch pads to the bucket, result slices back to nq
        qb, nb = msb._pad_batch(q)
        assert nb == nq and qb.shape[0] == {1: 1, 2: 2, 3: 4, 4: 4}[nq]
        got = msb.segment({"query": [_b64_png(qi) for qi in q],
                           "cache_id": cidb})
        want = msf.segment({"query": [_b64_png(qi) for qi in q],
                            "cache_id": cidf})
        assert got["masks"] == want["masks"]


def test_batch_buckets_rejected_out_of_range(pipe):
    with pytest.raises(ValueError, match="batch_buckets"):
        serve.ModelServer(pipe=pipe, bsz=2, nshot=1, img_size=S,
                          r_threshold=0.25, model_desc="tiny",
                          batch_buckets="1,8")


def test_warm_start_compiles_all_paths(pipe):
    """warm_start() must run clean on every bucket + the one-off path, and
    a subsequent request must serve without error (the compile-under-lock
    trap's operational fix)."""
    ms = serve.ModelServer(pipe=pipe, bsz=2, nshot=1, img_size=S,
                           r_threshold=0.25, model_desc="tiny",
                           batch_buckets="1")
    ms.warm_start()
    cid = ms.add_supports({"images": [_b64_png(_rgb(120))],
                           "masks": [_b64_png(_mask(121))]})["cache_id"]
    out = ms.segment({"query": _b64_png(_rgb(122)), "cache_id": cid})
    assert out["masks"]
    # the one-off EPISODE path at a partial bucket must also be warmed
    # (advisor, round 4: it pads to the same buckets as the cached path)
    out = ms.segment({"query": _b64_png(_rgb(123)),
                      "supports": [_b64_png(_rgb(124))],
                      "masks": [_b64_png(_mask(125))]})
    assert out["masks"]
