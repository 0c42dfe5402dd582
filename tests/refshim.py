"""Harness for running the REAL reference torch modules on CPU.

The reference depends on two native extensions we don't have (torch_scatter,
torch_geometric). Both are used through a tiny API surface (scatter_softmax /
scatter_add / scatter_sum, to_dense_batch / to_dense_adj), so we install
pure-torch shims into sys.modules and then import the actual files from
/root/reference/{FABind,FABind_plus}/fabind/models. No reference code is
copied — the golden tests execute the reference in place as the oracle.
"""
from __future__ import annotations

import importlib
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import torch

REF_BASE = "/root/reference/FABind/fabind"
REF_PLUS = "/root/reference/FABind_plus/fabind"


# --------------------------------------------------------------- shims
def _expand_index(index: torch.Tensor, src: torch.Tensor, dim: int):
    idx = index
    while idx.dim() < src.dim():
        idx = idx.unsqueeze(-1)
    return idx.expand_as(src)


def scatter_sum(src, index, dim=0, dim_size=None):
    if dim < 0:
        dim += src.dim()
    assert dim == 0, "shim supports dim=0 (the reference's only use)"
    n = int(index.max()) + 1 if dim_size is None else dim_size
    shape = (n,) + tuple(src.shape[1:])
    out = src.new_zeros(shape)
    out.scatter_add_(0, _expand_index(index, src, dim), src)
    return out


scatter_add = scatter_sum


def scatter_mean(src, index, dim=0, dim_size=None):
    s = scatter_sum(src, index, dim, dim_size)
    cnt = scatter_sum(torch.ones_like(src), index, dim, dim_size)
    return s / cnt.clamp(min=1)


def scatter_max(src, index, dim=0, dim_size=None):
    if dim < 0:
        dim += src.dim()
    assert dim == 0
    n = int(index.max()) + 1 if dim_size is None else dim_size
    shape = (n,) + tuple(src.shape[1:])
    out = src.new_full(shape, float("-inf"))
    out = out.scatter_reduce(0, _expand_index(index, src, dim), src,
                             reduce="amax", include_self=True)
    return out, None


def scatter_softmax(src, index, dim=0, dim_size=None):
    if dim < 0:
        dim += src.dim()
    assert dim == 0
    gmax, _ = scatter_max(src, index, 0, dim_size)
    ex = (src - gmax.gather(0, _expand_index(index, src, 0))).exp()
    gsum = scatter_sum(ex, index, 0, dim_size)
    return ex / gsum.gather(0, _expand_index(index, ex, 0))


def to_dense_batch(x, batch=None, fill_value=0.0, max_num_nodes=None,
                   batch_size=None):
    if batch is None:
        batch = x.new_zeros(x.size(0), dtype=torch.long)
    B = int(batch.max()) + 1 if batch_size is None else batch_size
    counts = torch.bincount(batch, minlength=B)
    M = int(counts.max()) if max_num_nodes is None else max_num_nodes
    out = x.new_full((B, M) + tuple(x.shape[1:]), fill_value)
    mask = torch.zeros(B, M, dtype=torch.bool)
    start = torch.cumsum(counts, 0) - counts
    pos = torch.arange(x.size(0)) - start[batch]
    out[batch, pos] = x
    mask[batch, pos] = True
    return out, mask


def to_dense_adj(edge_index, batch=None, edge_attr=None, max_num_nodes=None):
    if batch is None:
        n = int(edge_index.max()) + 1 if edge_index.numel() else 0
        n = max_num_nodes or n
        adj = torch.zeros(1, n, n)
        adj[0, edge_index[0], edge_index[1]] = (
            1.0 if edge_attr is None else edge_attr)
        return adj
    B = int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=B)
    M = int(counts.max()) if max_num_nodes is None else max_num_nodes
    start = torch.cumsum(counts, 0) - counts
    adj = torch.zeros(B, M, M)
    b = batch[edge_index[0]]
    r = edge_index[0] - start[b]
    c = edge_index[1] - start[b]
    adj[b, r, c] = 1.0 if edge_attr is None else edge_attr
    return adj


def install_shims():
    if "torch_scatter" in sys.modules:
        return
    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = scatter_sum
    ts.scatter_add = scatter_add
    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max
    ts.scatter_softmax = scatter_softmax
    sys.modules["torch_scatter"] = ts

    tg = types.ModuleType("torch_geometric")
    tgu = types.ModuleType("torch_geometric.utils")
    tgu.to_dense_batch = to_dense_batch
    tgu.to_dense_adj = to_dense_adj
    tgd = types.ModuleType("torch_geometric.data")
    tgd.Data = type("Data", (SimpleNamespace,), {})
    tgd.HeteroData = type("HeteroData", (SimpleNamespace,), {})
    tg.utils = tgu
    tg.data = tgd
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.utils"] = tgu
    sys.modules["torch_geometric.data"] = tgd

    # import-only stubs for host-side deps never exercised by the golden
    # tests (the reference imports them at module scope of utils/utils.py)
    for name in ("torchmetrics", "rdkit", "rdkit.Chem",
                 "rdkit.Chem.rdMolTransforms", "rdkit.Geometry",
                 "spyrmsd", "spyrmsd.rmsd", "spyrmsd.molecule"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["rdkit"].Chem = sys.modules["rdkit.Chem"]
    sys.modules["rdkit.Chem"].rdMolTransforms = sys.modules[
        "rdkit.Chem.rdMolTransforms"]
    sys.modules["rdkit.Geometry"].Point3D = type("Point3D", (), {})
    # generation_utils.py module-scope imports (never exercised)
    sys.modules["rdkit.Chem"].Draw = types.ModuleType("rdkit.Chem.Draw")
    sys.modules["rdkit.Chem"].AllChem = types.ModuleType(
        "rdkit.Chem.AllChem")


def load_ref_util(root: str, name: str):
    """Import a single self-contained reference utils module by file path
    (for modules with no intra-package imports, e.g. generation_utils)."""
    import importlib.util
    install_shims()
    path = os.path.join(root, "utils", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"_ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_LOADED: dict = {}


def load_ref_models(root: str):
    """Import the reference `models` package from `root` (FABind or
    FABind_plus). The two variants shadow each other's `models` package, so
    re-importing purges the previous one."""
    if root in _LOADED:
        return _LOADED[root]
    install_shims()
    for name in [m for m in sys.modules
                 if m in ("models", "utils")
                 or m.startswith(("models.", "utils."))]:
        del sys.modules[name]
    _LOADED.clear()
    sys.path.insert(0, root)
    try:
        egnn = importlib.import_module("models.egnn")
        att_model = importlib.import_module("models.att_model")
        cross_att = importlib.import_module("models.cross_att")
        model_utils = importlib.import_module("models.model_utils")
        model = importlib.import_module("models.model")
    finally:
        sys.path.remove(root)
    ns = SimpleNamespace(egnn=egnn, att_model=att_model, cross_att=cross_att,
                         model_utils=model_utils, model=model)
    _LOADED[root] = ns
    return ns


# --------------------------------------------------------------- args
def base_args(**over):
    """Released FABind base flags (test_fabind.py:182-185)."""
    a = SimpleNamespace(
        rm_layernorm=True,
        add_attn_pair_bias=True,
        explicit_pair_embed=True,
        add_cross_attn_layer=True,
        keep_trig_attn=False,
        opm=False,
        fix_pocket=False,
        rm_F_norm=False,
        norm_type="per_sample",
        random_n_iter=True,
        refine="refine_coord",
        rm_LAS_constrained_optim=False,
        geometry_reg_step_size=0.001,
        ablation_no_attention=False,
        ablation_no_attention_with_cross_attn=False,
    )
    for k, v in over.items():
        setattr(a, k, v)
    return a


def plus_args(**over):
    """Released FABind+ regression flags (test_regression_fabind.py:42)."""
    a = base_args(
        use_ln_mlp=True,
        mlp_hidden_scale=1,
        dropout=0.1,
        inter_additional_mlp=False,
        dis_pair_type="no",
        rel_dis_pair_bias="no",
        mha_permu=False,
        mha_heads=4,
        only_last_LAS=False,
    )
    for k, v in over.items():
        setattr(a, k, v)
    return a


# --------------------------------------------------------------- inputs
class ComplexSpec(SimpleNamespace):
    """Per-sample sizes: n_lig, n_pkt."""


def make_complex_inputs(seed: int, specs, hidden: int, coord_scale: float = 5.0):
    """Build matched torch (flat reference layout) and flax (padded dense)
    inputs for the EfficientMCAttModel golden test.

    Layout per sample (utils/utils.py:328-335): [glb_c | lig | glb_p | pkt].
    Coordinates are generated at Angstrom scale then normalized by
    coord_scale, ligand placed near the pocket so inter edges exist.
    """
    rng = np.random.default_rng(seed)
    B = len(specs)
    Nc = max(s["n_lig"] for s in specs)
    Np = max(s["n_pkt"] for s in specs)

    t_coords, t_h, t_batch, t_seg, t_glb = [], [], [], [], []
    t_bond_r, t_bond_c, t_las_r, t_las_c, t_las_coords = [], [], [], [], []
    f_x = np.zeros((B, Nc + Np + 2, 3), np.float32)
    f_h = np.zeros((B, Nc + Np + 2, hidden), np.float32)
    f_lig_mask = np.zeros((B, Nc), bool)
    f_pkt_mask = np.zeros((B, Np), bool)
    Kb = 4
    f_bond_idx = np.zeros((B, Nc, Kb), np.int32)
    f_bond_mask = np.zeros((B, Nc, Kb), bool)
    f_las_adj = np.zeros((B, Nc, Nc), bool)
    f_las_ref = np.zeros((B, Nc, 3), np.float32)

    offset = 0
    for b, s in enumerate(specs):
        nl, npk = s["n_lig"], s["n_pkt"]
        # pocket: blob of residues with ~4-8 A spacing
        pkt = rng.normal(0, 4.0, (npk, 3)).astype(np.float32)
        # ligand: tight blob at pocket center
        lig = rng.normal(0, 2.0, (nl, 3)).astype(np.float32)
        las_ref = (lig + rng.normal(0, 0.4, (nl, 3))).astype(np.float32)
        pkt /= coord_scale
        lig /= coord_scale
        las_ref /= coord_scale
        h_lig = rng.normal(0, 1, (nl, hidden)).astype(np.float32)
        h_pkt = rng.normal(0, 1, (npk, hidden)).astype(np.float32)
        h_glc = rng.normal(0, 1, (hidden,)).astype(np.float32)
        h_glp = rng.normal(0, 1, (hidden,)).astype(np.float32)

        # torch flat arrays
        n_nodes = nl + npk + 2
        coords = np.zeros((n_nodes, 3), np.float32)
        coords[1:1 + nl] = lig
        coords[nl + 2:] = pkt
        hh = np.zeros((n_nodes, hidden), np.float32)
        hh[0] = h_glc
        hh[1:1 + nl] = h_lig
        hh[nl + 1] = h_glp
        hh[nl + 2:] = h_pkt
        t_coords.append(coords)
        t_h.append(hh)
        t_batch.append(np.full(n_nodes, b, np.int64))
        seg = np.zeros(n_nodes, np.int64)
        seg[nl + 1:] = 1
        t_seg.append(seg)
        glb = np.zeros(n_nodes, bool)
        glb[0] = glb[nl + 1] = True
        t_glb.append(glb)

        las_coords = np.zeros((n_nodes, 3), np.float32)
        las_coords[1:1 + nl] = las_ref
        t_las_coords.append(las_coords)

        # chain bonds i <-> i+1 (global idx), both directions
        for i in range(nl - 1):
            gi, gj = offset + 1 + i, offset + 2 + i
            t_bond_r += [gi, gj]
            t_bond_c += [gj, gi]
        # LAS edges: bonds + 2-hop, both directions
        for i in range(nl - 1):
            gi, gj = offset + 1 + i, offset + 2 + i
            t_las_r += [gi, gj]
            t_las_c += [gj, gi]
        for i in range(nl - 2):
            gi, gj = offset + 1 + i, offset + 3 + i
            t_las_r += [gi, gj]
            t_las_c += [gj, gi]

        # flax padded arrays
        f_lig_mask[b, :nl] = True
        f_pkt_mask[b, :npk] = True
        f_x[b, 1:1 + nl] = lig
        f_x[b, Nc + 2:Nc + 2 + npk] = pkt
        f_h[b, 0] = h_glc
        f_h[b, 1:1 + nl] = h_lig
        f_h[b, Nc + 1] = h_glp
        f_h[b, Nc + 2:Nc + 2 + npk] = h_pkt
        f_las_ref[b, :nl] = las_ref
        for i in range(nl):
            k = 0
            if i > 0:
                f_bond_idx[b, i, k] = i - 1
                f_bond_mask[b, i, k] = True
                k += 1
            if i + 1 < nl:
                f_bond_idx[b, i, k] = i + 1
                f_bond_mask[b, i, k] = True
        for i in range(nl - 1):
            f_las_adj[b, i, i + 1] = f_las_adj[b, i + 1, i] = True
        for i in range(nl - 2):
            f_las_adj[b, i, i + 2] = f_las_adj[b, i + 2, i] = True

        offset += n_nodes

    torch_in = dict(
        X=torch.from_numpy(np.concatenate(t_coords))[:, None, :],
        H=torch.from_numpy(np.concatenate(t_h)),
        batch_id=torch.from_numpy(np.concatenate(t_batch)),
        segment_id=torch.from_numpy(np.concatenate(t_seg)),
        is_global=torch.from_numpy(np.concatenate(t_glb)),
        mask=torch.from_numpy(
            np.concatenate([
                np.concatenate([np.ones(s["n_lig"] + 2, bool),
                                np.zeros(s["n_pkt"], bool)])
                for s in specs])),
        compound_edge_index=torch.tensor([t_bond_r, t_bond_c],
                                         dtype=torch.long),
        LAS_edge_index=torch.tensor([t_las_r, t_las_c], dtype=torch.long),
        batched_complex_coord_LAS=torch.from_numpy(
            np.concatenate(t_las_coords))[:, None, :],
    )
    flax_in = dict(
        x=f_x, h=f_h, lig_mask=f_lig_mask, pkt_mask=f_pkt_mask,
        bond_idx=f_bond_idx, bond_mask=f_bond_mask,
        las_adj=f_las_adj, las_ref=f_las_ref,
    )
    return torch_in, flax_in, specs


class FakeData:
    """Minimal stand-in for a collated PyG HeteroData batch: dict of
    attribute stores keyed by node/edge store name, plus top-level attrs."""

    def __init__(self):
        self._stores = {}

    def __getitem__(self, key):
        if isinstance(key, tuple):
            key = tuple(key)
        return self._stores.setdefault(key, SimpleNamespace())


def make_full_fixture(seed: int, specs, esm_dim: int = 15,
                      pocket_radius: float = 8.0, dis_map_clamp: float = 10.0,
                      pocket_radius_buffer: float | None = None,
                      min_pocket_radius: float = 0.0):
    """Matched (torch FakeData, numpy padded dict) inputs for the full-model
    golden test, mirroring construct_data_from_graph_gvp_mean
    (FABind/fabind/utils/utils.py:202-442) in eval mode
    (pocket_center_rdkit init, no noise, no rotation, includeDisMap).

    With pocket_radius_buffer set, uses the FABind+ dynamic host crop radius
    (buffer + ligand_radius if buffer>2 else buffer*ligand_radius, floored at
    min_pocket_radius; FABind_plus/fabind/utils/utils.py:214-228).

    specs: list of {"n_lig": int, "n_prot": int}.
    """
    rng = np.random.default_rng(seed)
    B = len(specs)
    Nc = max(s["n_lig"] for s in specs)
    Nr = max(s["n_prot"] for s in specs)
    Kb = 4

    data = FakeData()
    per = {k: [] for k in
           ("lig_feat", "lig_gt", "lig_init", "rdkit", "prot_xyz", "esm",
            "keep", "input_xyz", "dis_map", "bond_local", "las_local")}

    for s in specs:
        nl, npr = s["n_lig"], s["n_prot"]
        prot = rng.normal(0, 5.0, (npr, 3)).astype(np.float32)
        prot = prot - prot.mean(0, keepdims=True)
        anchor = prot[rng.integers(npr)]
        lig = (anchor + rng.normal(0, 1.5, (nl, 3))).astype(np.float32)
        com = lig.mean(0)
        r = pocket_radius
        if pocket_radius_buffer is not None:
            lig_radius = float(np.max(np.linalg.norm(lig - com, axis=-1)))
            if pocket_radius_buffer <= 2.0:
                r = pocket_radius_buffer * lig_radius
            else:
                r = pocket_radius_buffer + lig_radius
            r = max(r, min_pocket_radius)
        keep = np.linalg.norm(prot - com, axis=-1) < r
        if keep.sum() < 5:
            keep[:100] = True
        input_xyz = prot[keep]
        rdkit = (lig + rng.normal(0, 0.4, (nl, 3))).astype(np.float32)
        init = rdkit - rdkit.mean(0, keepdims=True) + input_xyz.mean(
            0, keepdims=True)
        dm = np.linalg.norm(input_xyz[:, None] - lig[None], axis=-1)
        dm = np.minimum(dm, dis_map_clamp)

        bonds = []
        for i in range(nl - 1):
            bonds += [(i, i + 1), (i + 1, i)]
        las = list(bonds)
        for i in range(nl - 2):
            las += [(i, i + 2), (i + 2, i)]

        per["lig_feat"].append(rng.normal(0, 1, (nl, 56)).astype(np.float32))
        per["lig_gt"].append(lig)
        per["lig_init"].append(init.astype(np.float32))
        per["rdkit"].append(rdkit)
        per["prot_xyz"].append(prot)
        per["esm"].append(rng.normal(0, 1, (npr, esm_dim)).astype(np.float32))
        per["keep"].append(keep)
        per["input_xyz"].append(input_xyz.astype(np.float32))
        per["dis_map"].append(dm.astype(np.float32))
        per["bond_local"].append(np.asarray(bonds, np.int64))
        per["las_local"].append(np.asarray(las, np.int64))

    # ---------------- torch side (collated reference layout) ----------------
    T = torch.from_numpy

    def cat(xs):
        return torch.cat([T(np.ascontiguousarray(x)) for x in xs], 0)

    def batch_vec(lengths):
        return torch.cat([torch.full((n,), i, dtype=torch.long)
                          for i, n in enumerate(lengths)])

    comp = data["compound"]
    comp.node_feats = cat(per["lig_feat"]).float()
    comp.node_coords = cat(per["lig_init"])
    comp.rdkit_coords = cat(per["rdkit"])
    comp.batch = batch_vec([s["n_lig"] for s in specs])

    pk = data["pocket"]
    pk.node_feats = cat([e[k] for e, k in zip(per["esm"], per["keep"])])
    pk.keepNode = cat([k.astype(bool) for k in per["keep"]])
    pk.batch = batch_vec([int(k.sum()) for k in per["keep"]])

    pw = data["protein_whole"]
    pw.node_feats = cat(per["esm"]).float()
    pw.batch = batch_vec([s["n_prot"] for s in specs])

    cx = data["complex"]
    cwp = data["complex_whole_protein"]
    for store, pkt_list in ((cx, per["input_xyz"]), (cwp, per["prot_xyz"])):
        coords, las_c, seg, mask, glb = [], [], [], [], []
        c2c_r, c2c_c, lasr, lasc = [], [], [], []
        off = 0
        for b, s in enumerate(specs):
            nl = s["n_lig"]
            pkt = pkt_list[b]
            npk = pkt.shape[0]
            z = np.zeros((1, 3), np.float32)
            lig_init = per["lig_init"][b]
            if store is cwp:
                lig_init = lig_init - lig_init.mean(0, keepdims=True)
            coords.append(np.concatenate([z, lig_init, z, pkt]))
            las_c.append(np.concatenate(
                [z, per["rdkit"][b], z, np.zeros_like(pkt)]))
            sg = np.zeros(nl + npk + 2)
            sg[nl + 1:] = 1
            seg.append(sg)
            mk = np.zeros(nl + npk + 2, bool)
            mk[:nl + 2] = True
            mask.append(mk)
            gl = np.zeros(nl + npk + 2, bool)
            gl[0] = gl[nl + 1] = True
            glb.append(gl)
            for i, j in per["bond_local"][b]:
                c2c_r.append(off + 1 + i)
                c2c_c.append(off + 1 + j)
            for i, j in per["las_local"][b]:
                lasr.append(off + 1 + i)
                lasc.append(off + 1 + j)
            off += nl + npk + 2
        store.node_coords = T(np.concatenate(coords)).float()
        store.node_coords_LAS = T(np.concatenate(las_c)).float()
        store.segment = T(np.concatenate(seg)).float()
        store.mask = T(np.concatenate(mask))
        store.is_global = T(np.concatenate(glb))
        store.batch = batch_vec(
            [s["n_lig"] + p.shape[0] + 2
             for s, p in zip(specs, pkt_list)])
        name = ("complex" if store is cx else "complex_whole_protein")
        data[name, "c2c", name].edge_index = torch.tensor(
            [c2c_r, c2c_c], dtype=torch.long)
        data[name, "LAS", name].edge_index = torch.tensor(
            [lasr, lasc], dtype=torch.long)

    ael = data["compound_atom_edge_list"]
    ael.x = cat([bl + 1 for bl in per["bond_local"]]).long()
    ael.batch = batch_vec([len(bl) for bl in per["bond_local"]])
    lel = data["LAS_edge_list"]
    lel.x = cat([ll + 1 for ll in per["las_local"]]).long()
    lel.batch = batch_vec([len(ll) for ll in per["las_local"]])

    data.node_xyz = cat(per["input_xyz"])
    data.node_xyz_whole = cat(per["prot_xyz"])
    data.coords_center = torch.stack(
        [T(g.mean(0)) for g in per["lig_gt"]])
    data.dis_map = cat([d.flatten() for d in per["dis_map"]])
    data.pocket_idx = cat([k.astype(np.int32) for k in per["keep"]])
    data.coords = cat(per["lig_gt"])
    data.pocket_residue_center = torch.stack(
        [T(x.mean(0)) for x in per["input_xyz"]])
    data.ligand_radius = torch.tensor(
        [float(np.max(np.linalg.norm(g - g.mean(0), axis=-1)))
         for g in per["lig_gt"]])

    # ---------------- flax side (padded dense FABindBatch fields) -----------
    Npk = max(int(k.sum()) for k in per["keep"])
    fl = dict(
        lig_feat=np.zeros((B, Nc, 56), np.float32),
        lig_mask=np.zeros((B, Nc), bool),
        lig_coords=np.zeros((B, Nc, 3), np.float32),
        lig_coords_init=np.zeros((B, Nc, 3), np.float32),
        lig_rdkit_coords=np.zeros((B, Nc, 3), np.float32),
        bond_idx=np.zeros((B, Nc, Kb), np.int32),
        bond_mask=np.zeros((B, Nc, Kb), bool),
        las_adj=np.zeros((B, Nc, Nc), bool),
        prot_feat=np.zeros((B, Nr, esm_dim), np.float32),
        prot_mask=np.zeros((B, Nr), bool),
        prot_xyz=np.zeros((B, Nr, 3), np.float32),
        pocket_idx=np.zeros((B, Npk), np.int32),
        pocket_mask=np.zeros((B, Npk), bool),
        pocket_label=np.zeros((B, Nr), np.float32),
        coords_center=np.zeros((B, 3), np.float32),
        ligand_radius=np.zeros((B,), np.float32),
        pocket_residue_center=np.zeros((B, 3), np.float32),
    )
    for b, s in enumerate(specs):
        nl, npr = s["n_lig"], s["n_prot"]
        keep = per["keep"][b]
        nk = int(keep.sum())
        fl["lig_feat"][b, :nl] = per["lig_feat"][b]
        fl["lig_mask"][b, :nl] = True
        fl["lig_coords"][b, :nl] = per["lig_gt"][b]
        fl["lig_coords_init"][b, :nl] = per["lig_init"][b]
        fl["lig_rdkit_coords"][b, :nl] = per["rdkit"][b]
        fl["prot_feat"][b, :npr] = per["esm"][b]
        fl["prot_mask"][b, :npr] = True
        fl["prot_xyz"][b, :npr] = per["prot_xyz"][b]
        fl["pocket_idx"][b, :nk] = np.nonzero(keep)[0]
        fl["pocket_mask"][b, :nk] = True
        fl["pocket_label"][b, :npr] = keep.astype(np.float32)
        fl["coords_center"][b] = per["lig_gt"][b].mean(0)
        fl["ligand_radius"][b] = np.max(np.linalg.norm(
            per["lig_gt"][b] - per["lig_gt"][b].mean(0), axis=-1))
        fl["pocket_residue_center"][b] = per["input_xyz"][b].mean(0)
        slots = np.zeros(nl, np.int32)
        for i, j in per["bond_local"][b]:
            fl["bond_idx"][b, i, slots[i]] = j
            fl["bond_mask"][b, i, slots[i]] = True
            slots[i] += 1
        for i, j in per["las_local"][b]:
            fl["las_adj"][b, i, j] = True
    return data, fl, specs


def split_flat(arr: np.ndarray, specs, part: str) -> list:
    """Slice a reference flat node array into per-sample lig/pkt parts."""
    out = []
    off = 0
    for s in specs:
        nl, npk = s["n_lig"], s["n_pkt"]
        n = nl + npk + 2
        if part == "lig":
            out.append(arr[off + 1:off + 1 + nl])
        elif part == "pkt":
            out.append(arr[off + nl + 2:off + n])
        elif part == "glb":
            out.append(arr[[off, off + nl + 1]])
        off += n
    return out
