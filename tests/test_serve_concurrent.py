"""Serving robustness under concurrency (round-2 item).

The DockingEngine's threading contract (see its docstring): all dock_*
methods may be called concurrently; executable/protein caches use
double-checked locking; device work interleaves at batch granularity.
These tests fire concurrent mixed workloads — dock_raw across buckets plus
screening — at both the engine and the HTTP daemon, and assert bitwise
parity with the single-threaded answers.
"""
import io
import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from fabind_tpu.config import preset
from fabind_tpu.serve import DockingEngine
from fabind_tpu.serve_http import make_server

from common import TINY
from test_serve import make_raw


def _coords(poses):
    return [np.asarray(p.coords, np.float32) for p in poses]


def test_engine_concurrent_mixed_buckets_parity():
    import dataclasses
    cfg = preset("fabind", **TINY)
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                max_protein=24, ctx_k=6, ctx_k_whole=6)
    eng = DockingEngine(cfg, buckets=[small, cfg.shapes], batch_size=2,
                        bf16=False)

    reqs = {
        "small": [make_raw(n=5, nr=20, seed=1), make_raw(n=6, nr=20, seed=2)],
        "large": [make_raw(n=12, nr=40, seed=3),
                  make_raw(n=11, nr=44, seed=4)],
        "mixed": [make_raw(n=5, nr=20, seed=5), make_raw(n=12, nr=40, seed=6)],
    }
    protein = make_raw(n=6, nr=20, seed=7)
    screen_prot = {k: protein[k] for k in ("protein_xyz", "esm_feat")}
    screen_ligs = [{k: v for k, v in make_raw(n=6, nr=20, seed=s).items()
                    if not k.startswith(("protein", "esm"))}
                   for s in (8, 9)]

    # single-threaded reference answers
    ref = {k: _coords(eng.dock_raw(v)) for k, v in reqs.items()}
    ref["screen"] = _coords(eng.dock_screen(screen_prot, screen_ligs))

    # 16 concurrent calls cycling through all workload kinds
    def work(i):
        kind = ["small", "large", "mixed", "screen"][i % 4]
        if kind == "screen":
            return kind, _coords(eng.dock_screen(screen_prot, screen_ligs))
        return kind, _coords(eng.dock_raw(reqs[kind]))

    with ThreadPoolExecutor(8) as ex:
        outs = list(ex.map(work, range(16)))
    for kind, got in outs:
        for a, b in zip(got, ref[kind]):
            np.testing.assert_array_equal(a, b)


def test_engine_concurrent_cold_cache_single_compile():
    """First-touch concurrency: many threads hit an engine whose executable
    caches are cold; double-checked locking must compile each bucket once
    and produce identical results."""
    import dataclasses
    cfg = preset("fabind", **TINY)
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                max_protein=24, ctx_k=6, ctx_k_whole=6)
    eng = DockingEngine(cfg, buckets=[small, cfg.shapes], batch_size=2,
                        bf16=False)
    raws = [make_raw(n=5, nr=20, seed=1), make_raw(n=12, nr=40, seed=2)]

    with ThreadPoolExecutor(6) as ex:
        outs = list(ex.map(lambda _: _coords(eng.dock_raw(raws)), range(6)))
    assert len(eng._fns) == 2      # one executable per bucket, no dupes
    for got in outs[1:]:
        for a, b in zip(got, outs[0]):
            np.testing.assert_array_equal(a, b)


def _post(url, body):
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def _npz_bytes(entries):
    buf = io.BytesIO()
    np.savez(buf, **entries)
    return buf.getvalue()


def test_http_concurrent_requests_parity():
    cfg = preset("fabind", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv = make_server(eng, "127.0.0.1", 0, max_inflight=3)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        raws = [make_raw(n=5, nr=20, seed=1), make_raw(n=6, nr=20, seed=2)]
        dock_body = _npz_bytes({f"r{i}_{k}": v
                                for i, raw in enumerate(raws)
                                for k, v in raw.items()})
        prot = make_raw(n=6, nr=20, seed=3)
        screen_entries = {k: prot[k] for k in ("protein_xyz", "esm_feat")}
        for i, s in enumerate((4, 5)):
            for k, v in make_raw(n=6, nr=20, seed=s).items():
                if not k.startswith(("protein", "esm")):
                    screen_entries[f"r{i}_{k}"] = v
        screen_body = _npz_bytes(screen_entries)

        s0, ref_dock = _post(base + "/dock_raw", dock_body)
        s1, ref_screen = _post(base + "/screen", screen_body)
        assert s0 == 200 and s1 == 200

        def work(i):
            if i % 2:
                return "dock", _post(base + "/dock_raw", dock_body)
            return "screen", _post(base + "/screen", screen_body)

        with ThreadPoolExecutor(6) as ex:
            outs = list(ex.map(work, range(12)))
        for kind, (status, poses) in outs:
            assert status == 200
            ref = ref_dock if kind == "dock" else ref_screen
            assert len(poses) == len(ref)
            for p, r in zip(poses, ref):
                assert p["error"] is None
                np.testing.assert_array_equal(
                    np.asarray(p["coords"], np.float32),
                    np.asarray(r["coords"], np.float32))
    finally:
        srv.shutdown()
