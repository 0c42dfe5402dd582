"""Minimal HTTP serving daemon around `DockingEngine` (stdlib-only).

The reference ships one-shot inference scripts (fabind_inference.py); the
engine (`fabind_tpu.serve`) makes docking a resident library call, and this
module makes it a network service: the checkpoint loads once, each shape
bucket compiles once, then requests are served until shutdown.

Endpoints:
  GET  /health     -> {"status": "ok", "buckets": [...], "batch_size": N}
  POST /dock_raw   -> body: .npz bytes; arrays for request i are prefixed
                      "r{i}_" (r0_lig_coords, r0_lig_feats, r0_bond_edges,
                      r0_las_mask, r0_rdkit_coords, r0_protein_xyz,
                      r0_esm_feat, ...). Response: JSON list of
                      {coords, confidence, error} in request order.
  POST /screen     -> body: .npz bytes; shared protein under "protein_xyz"/
                      "esm_feat" (+optional "protein_full_coords"), ligands
                      under "r{i}_" prefixes. Same response shape.
  POST /dock       -> body: JSON [{"smiles": ..., "pdb": server_path}, ...]
                      (requires RDKit on the server). Same response shape.
  POST /dock_sdf   -> body: JSON [{"sdf": "<V2000 molfile text>",
                      "pdb": server_path}, ...] — ligand conformers inline
                      (never a server path), redocked from the given pose;
                      RDKit-free (pure V2000 reader). Successful poses add
                      an "sdf" field: the docked pose as molfile text.
                      ?randomize_init=1&seed=K randomizes torsions +
                      orientation (redocking protocol, serve.py dock_sdf).
  POST /dock_best_of -> same .npz body as /dock_raw;
                      ?sample_size=N&seed=K runs FABind+ best-of-N
                      sampling (highest-confidence pose wins). Needs a
                      confidence-head checkpoint (fabind_plus_sampling) —
                      or an AOT engine exported with --sampling.

Run:  python -m fabind_tpu.cli.serve --preset fabind --ckpt best_model.bin \
          --port 8400 [--buckets auto --data ...]

Transport notes: npz keeps the 1280-d ESM features binary (JSON floats
would 4x the payload); responses are JSON because poses are small. The
server is a ThreadingHTTPServer and the engine's dock_* methods are
thread-safe (see DockingEngine's threading contract), so concurrent
requests pipeline their device batches instead of serializing whole
requests; a semaphore bounds in-flight engine calls (default 4) to cap
peak activation memory. Batching across clients still works best by
sending multiple requests in one npz, which the engine routes and batches
internally.
"""
from __future__ import annotations

import io
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List

import numpy as np

_PREFIX = re.compile(r"^r(\d+)_(.+)$")


def _group_npz(data: bytes) -> List[Dict[str, np.ndarray]]:
    """Split "r{i}_{field}" npz entries into per-request dicts; un-prefixed
    entries are shared by every request."""
    z = np.load(io.BytesIO(data), allow_pickle=False)
    shared: Dict[str, np.ndarray] = {}
    per: Dict[int, Dict[str, np.ndarray]] = {}
    for k in z.files:
        m = _PREFIX.match(k)
        if m:
            per.setdefault(int(m.group(1)), {})[m.group(2)] = z[k]
        else:
            shared[k] = z[k]
    if not per:
        return [shared] if shared else []
    # iterate the indices actually present (ascending) — expanding to
    # max(per)+1 would let one tiny entry named r4000000000_x allocate
    # billions of dicts, defeating the request-size guard
    out = []
    for i in sorted(per):
        d = dict(shared)
        d.update(per[i])
        out.append(d)
    return out


def _finite_list(arr: np.ndarray):
    """tolist() with non-finite floats as null: bare NaN/Infinity tokens are
    invalid JSON and strict parsers reject the whole response."""
    arr = np.asarray(arr, np.float32)
    if np.isfinite(arr).all():
        return arr.tolist()
    return [[float(x) if np.isfinite(x) else None for x in row]
            for row in arr.reshape(arr.shape[0], -1)]


def _poses_json(poses) -> bytes:
    out = []
    for p in poses:
        conf = float(p.confidence)
        d = {
            "coords": _finite_list(p.coords),
            "confidence": conf if np.isfinite(conf) else None,
            "error": p.error,
        }
        if getattr(p, "pocket_truncated", 0):
            # predicted pocket crop exceeded the bucket's Np — the caller
            # should re-dock with a larger bucket (DESIGN.md hazard)
            d["pocket_truncated"] = int(p.pocket_truncated)
        if p.pocket_coords is not None:   # flexible-docking engines
            d["pocket_coords"] = _finite_list(p.pocket_coords)
            d["pocket_residues"] = np.asarray(
                p.pocket_residues).tolist()
        if getattr(p, "sdf_meta", None) is not None and p.error is None \
                and np.isfinite(np.asarray(p.coords)).all():
            # /dock_sdf: return the docked pose as ready-to-save molfile
            # text alongside the raw coords
            from fabind_tpu.data.featurize import sdf_string
            d["sdf"] = sdf_string(p.sdf_meta["symbols"], p.coords,
                                  p.sdf_meta["bonds"],
                                  charges=p.sdf_meta["charges"])
        out.append(d)
    return json.dumps(out).encode()


def make_server(engine, host: str = "127.0.0.1", port: int = 8400,
                max_inflight: int = 4,
                max_body_bytes: int = 256 * 1024 * 1024,
                pdb_root: str = None) -> ThreadingHTTPServer:
    """pdb_root: when set, /dock requests may only reference PDB files under
    this directory ('pdb' values are joined to it and path-checked) —
    without it, clients can probe arbitrary server paths via error
    messages. Raw-tensor endpoints (/dock_raw, /screen) are unaffected."""
    import os
    # engine methods are thread-safe; the semaphore only bounds how many
    # requests hold device batches in flight at once (memory, not safety)
    lock = threading.Semaphore(max_inflight)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet by default
            pass

        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._reply(404, b'{"error": "not found"}')
            info = {
                "status": "ok",
                "batch_size": engine.batch_size,
                "bf16": engine.bf16,
                "dp": engine.dp,
                "buckets": [[c.shapes.max_ligand, c.shapes.max_pocket,
                             c.shapes.max_protein]
                            for c in engine.bucket_cfgs],
            }
            self._reply(200, json.dumps(info).encode())

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > max_body_bytes:
                    # refuse before buffering: a runaway client must not be
                    # able to OOM the serving host
                    return self._reply(413, json.dumps(
                        {"error": f"body {n} bytes exceeds limit "
                                  f"{max_body_bytes}"}).encode())
                body = self.rfile.read(n)
                from urllib.parse import parse_qs, urlparse
                url = urlparse(self.path)
                self.path = url.path
                q = parse_qs(url.query)

                def qint(name, default):
                    return int(q[name][0]) if name in q else default

                if self.path == "/dock_raw":
                    raws = _group_npz(body)
                    with lock:
                        poses = engine.dock_raw(raws)
                elif self.path == "/dock_best_of":
                    # FABind+ best-of-N sampling: same .npz body as
                    # /dock_raw; ?sample_size=N&seed=K (reference
                    # inference_sampling_fabind.py:172-210). Works on AOT
                    # engines exported with --sampling.
                    raws = _group_npz(body)
                    with lock:
                        poses = engine.dock_best_of(
                            raws, sample_size=qint("sample_size", 40),
                            seed=qint("seed", 0))
                elif self.path == "/screen":
                    reqs = _group_npz(body)
                    pkeys = ("protein_xyz", "esm_feat",
                             "protein_full_coords")
                    if not reqs or "protein_xyz" not in reqs[0]:
                        return self._reply(400, json.dumps(
                            {"error": "screen needs a protein_xyz (+ "
                                      "esm_feat) entry and r{i}_-prefixed "
                                      "ligand entries"}).encode())
                    protein = {k: reqs[0][k] for k in pkeys if k in reqs[0]}
                    ligs = [{k: v for k, v in r.items() if k not in pkeys}
                            for r in reqs]
                    with lock:
                        poses = engine.dock_screen(protein, ligs)
                elif self.path == "/dock":
                    reqs = json.loads(body)
                    pairs = []
                    for r in reqs:
                        pdb = r["pdb"]
                        if pdb_root is not None:
                            pdb = os.path.realpath(
                                os.path.join(pdb_root, pdb))
                            if not pdb.startswith(
                                    os.path.realpath(pdb_root) + os.sep):
                                return self._reply(400, json.dumps(
                                    {"error": f"pdb path {r['pdb']!r} "
                                              "escapes --pdb-root"}).encode())
                        pairs.append((r["smiles"], pdb))
                    with lock:
                        poses = engine.dock_smiles(pairs)
                elif self.path == "/dock_sdf":
                    # JSON [{"sdf": "<V2000 molfile text>", "pdb": "..."}]:
                    # ligand conformers inline (no server-path access for
                    # ligands), protein under the same --pdb-root guard as
                    # /dock; RDKit-free both ways (pure V2000 reader +
                    # sdf field in the response)
                    reqs = json.loads(body)
                    pairs = []
                    for r in reqs:
                        pdb = r["pdb"]
                        if pdb_root is not None:
                            pdb = os.path.realpath(
                                os.path.join(pdb_root, pdb))
                            if not pdb.startswith(
                                    os.path.realpath(pdb_root) + os.sep):
                                return self._reply(400, json.dumps(
                                    {"error": f"pdb path {r['pdb']!r} "
                                              "escapes --pdb-root"}).encode())
                        sdf = r["sdf"]
                        if "\n" not in sdf:
                            # a bare path would read server files; inline
                            # molfile text only on this endpoint
                            return self._reply(400, json.dumps(
                                {"error": "sdf must be inline molfile "
                                          "text, not a path"}).encode())
                        pairs.append((sdf, pdb))
                    with lock:
                        # ?randomize_init=1&seed=K: seeded torsion +
                        # orientation randomization (redocking protocol;
                        # serve.py dock_sdf docstring)
                        poses = engine.dock_sdf(
                            pairs,
                            randomize_init=bool(qint("randomize_init", 0)),
                            seed=qint("seed", 0))
                else:
                    return self._reply(404, b'{"error": "not found"}')
                self._reply(200, _poses_json(poses))
            except Exception as e:   # per-request fault isolation
                self._reply(500, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode())

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(engine, host: str = "127.0.0.1", port: int = 8400,
                  pdb_root: str = None) -> None:
    srv = make_server(engine, host, port, pdb_root=pdb_root)
    print(f"fabind_tpu serving on http://{host}:{srv.server_address[1]} "
          f"(buckets: {len(engine.bucket_cfgs)}, batch {engine.batch_size})")
    srv.serve_forever()
