"""ctypes bindings for the native batch packer (native/collate.cc).

The library is built on demand with the system compiler; the pure-python
collator (batching.py) remains the reference implementation and fallback.
`collate_native` produces bit-identical batches (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB = None

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "collate.cc")


def build_library(out_dir: Optional[str] = None) -> str:
    out_dir = out_dir or os.path.dirname(_SRC)
    out = os.path.join(out_dir, "libfabind_collate.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(_SRC)):
        cc = os.environ.get("CXX", "g++")
        subprocess.check_call(
            [cc, "-O3", "-shared", "-fPIC", "-o", out, _SRC])
    return out


def get_lib():
    global _LIB
    if _LIB is None:
        path = build_library()
        lib = ctypes.CDLL(path)
        i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32 = ctypes.c_int32
        lib.pack_f32.argtypes = [f32p, i64, i64, f32p, u8p, i64, i64]
        lib.pack_f32.restype = i32
        lib.pack_bonds.argtypes = [i64p, i64, i32p, u8p, i64, i64, i64]
        lib.pack_bonds.restype = i64
        lib.pack_adj.argtypes = [u8p, i64, u8p, i64, i64]
        lib.pack_adj.restype = i32
        _LIB = lib
    return _LIB


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def collate_native(samples: Sequence[dict], cfg, max_iso: int = 8,
                   n_valid: Optional[int] = None):
    """Native-packed equivalent of batching.collate.

    Limitation: isomorphism tables are NOT packed (batch.isomorphisms is
    always None here) — samples carrying them are rejected rather than
    silently losing the permutation-invariant loss downstream
    (train/losses.py falls back to the plain coordinate loss when
    isomorphisms is None)."""
    for x in samples:
        iso = x.get("isomorphisms")
        if iso is not None and len(iso):
            raise NotImplementedError(
                "collate_native does not pack isomorphism tables; use the "
                "python collate (batching.collate) for the FABind+ "
                "permutation-loss pipeline")
    from fabind_tpu.data.batching import SampleTooLarge
    from fabind_tpu.data.types import FABindBatch

    lib = get_lib()
    s = cfg.shapes
    B = len(samples)
    Nc, Np, Nr, Kb = s.max_ligand, s.max_pocket, s.max_protein, s.bond_k

    def zeros(*shape, dtype=np.float32):
        return np.zeros(shape, dtype)

    out = dict(
        lig_feat=zeros(B, Nc, cfg.model.compound_feat_dim),
        lig_mask=zeros(B, Nc, dtype=np.uint8),
        lig_coords=zeros(B, Nc, 3),
        lig_coords_init=zeros(B, Nc, 3),
        lig_rdkit_coords=zeros(B, Nc, 3),
        bond_idx=zeros(B, Nc, Kb, dtype=np.int32),
        bond_mask=zeros(B, Nc, Kb, dtype=np.uint8),
        las_adj=zeros(B, Nc, Nc, dtype=np.uint8),
        prot_feat=zeros(B, Nr, cfg.model.protein_feat_dim),
        prot_mask=zeros(B, Nr, dtype=np.uint8),
        prot_xyz=zeros(B, Nr, 3),
        pocket_idx=zeros(B, Np, dtype=np.int32),
        pocket_mask=zeros(B, Np, dtype=np.uint8),
        pocket_label=zeros(B, Nr),
        coords_center=zeros(B, 3),
        ligand_radius=zeros(B),
        pocket_residue_center=zeros(B, 3),
    )

    for b, x in enumerate(samples):
        n = x["lig_feat"].shape[0]
        nr = x["prot_xyz"].shape[0]
        if n > Nc:
            raise SampleTooLarge(f"ligand {n} > {Nc}")
        if nr > Nr:
            raise SampleTooLarge(f"protein {nr} > {Nr}")

        def pack(key, src, N, mask_key=None):
            # validate BEFORE handing pointers to C: a row count or feature
            # dim that disagrees with the destination buffer would memcpy
            # past the slot (the python collate raises on these; the native
            # path must never corrupt memory instead)
            src = np.ascontiguousarray(src, np.float32)
            dst = out[key]
            d = dst.shape[2] if dst.ndim > 2 else 1
            src_d = src.shape[1] if src.ndim > 1 else 1
            if src_d != d:
                raise ValueError(f"{key}: feature dim {src_d} != {d}")
            if src.shape[0] > N:
                raise SampleTooLarge(f"{key}: {src.shape[0]} rows > {N}")
            rc = lib.pack_f32(_fp(src), src.shape[0], d, _fp(dst),
                              _u8(out[mask_key]) if mask_key else
                              ctypes.cast(None,
                                          ctypes.POINTER(ctypes.c_uint8)),
                              b, N)
            if rc != 0:
                raise ValueError(f"pack_f32({key}) error {rc}")

        pack("lig_feat", x["lig_feat"], Nc, "lig_mask")
        pack("lig_coords", x["lig_coords"], Nc)
        pack("lig_coords_init", x["lig_coords_init"], Nc)
        pack("lig_rdkit_coords", x["lig_rdkit_coords"], Nc)
        pack("prot_feat", x["prot_feat"], Nr, "prot_mask")
        pack("prot_xyz", x["prot_xyz"], Nr)

        edges = np.ascontiguousarray(x["bond_edges"], np.int64) \
            if "bond_edges" in x else _nbrs_to_edges(x["bond_nbrs"])
        deg = lib.pack_bonds(_i64(edges), edges.shape[0],
                             _i32(out["bond_idx"]), _u8(out["bond_mask"]),
                             b, Nc, Kb)
        if deg > Kb:
            raise SampleTooLarge(f"bond degree {deg} > {Kb}")
        if deg < 0:
            raise ValueError(f"pack_bonds error {deg}")

        adj = np.ascontiguousarray(x["las_adj"], np.uint8)
        if lib.pack_adj(_u8(adj), adj.shape[0], _u8(out["las_adj"]),
                        b, Nc) != 0:
            raise SampleTooLarge(f"las_adj {adj.shape[0]} > {Nc}")

        pidx = np.ascontiguousarray(x["pocket_idx"][:Np], np.int32)
        out["pocket_idx"][b, :len(pidx)] = pidx
        out["pocket_mask"][b, :len(pidx)] = 1
        out["pocket_label"][b, :nr] = x["pocket_label"]
        out["coords_center"][b] = x["coords_center"]
        out["ligand_radius"][b] = x["ligand_radius"]
        out["pocket_residue_center"][b] = x["pocket_residue_center"]

    for k in ("lig_mask", "prot_mask", "pocket_mask", "bond_mask", "las_adj"):
        out[k] = out[k].astype(bool)
    out["isomorphisms"] = None
    out["iso_mask"] = None
    out["sample_valid"] = (np.arange(B) < (B if n_valid is None else n_valid))
    return FABindBatch(**out)


def _nbrs_to_edges(nbrs):
    e = []
    for i, js in enumerate(nbrs):
        for j in js:
            e.append((i, j))
    return np.ascontiguousarray(np.asarray(e, np.int64).reshape(-1, 2))
