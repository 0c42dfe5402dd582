"""Device-side batch pytree (no host-only deps).

Fixed-shape replacement for the reference's PyG HeteroData batches
(FABind/fabind/utils/utils.py:202-442). All arrays are padded to the
ShapeConfig bucket; valid entries are prefix-packed (masks are prefix masks).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class FABindBatch:
    # ligand ("compound")
    lig_feat: Array          # [B, Nc, 56] torchdrug-style atom features
    lig_mask: Array          # [B, Nc] bool
    lig_coords: Array        # [B, Nc, 3] ground-truth coords, protein-mean frame
    lig_coords_init: Array   # [B, Nc, 3] init coords (pocket_center_rdkit mode)
    lig_rdkit_coords: Array  # [B, Nc, 3] rdkit conformer (LAS reference)
    bond_idx: Array          # [B, Nc, Kb] int32 ligand-local bond neighbors
    bond_mask: Array         # [B, Nc, Kb] bool
    las_adj: Array           # [B, Nc, Nc] bool LAS constraint adjacency

    # protein (whole)
    prot_feat: Array         # [B, Nr, 1280] ESM2 features
    prot_mask: Array         # [B, Nr] bool
    prot_xyz: Array          # [B, Nr, 3] CA coords, protein-mean frame

    # precomputed pocket crop (stage-1 / teacher forcing)
    pocket_idx: Array        # [B, Np] int32 indices into protein rows
    pocket_mask: Array       # [B, Np] bool
    pocket_label: Array      # [B, Nr] float/int binary residue labels (no-noise)

    coords_center: Array     # [B, 3] gt ligand centroid (pocket-center label)

    # FABind+ extras (zeros for base)
    ligand_radius: Array     # [B] max atom distance from ligand centroid
    pocket_residue_center: Array  # [B, 3] mean of precomputed pocket residues

    # permutation-invariant loss support (identity perm when absent)
    isomorphisms: Optional[Array] = None   # [B, n_iso, Nc] int32
    iso_mask: Optional[Array] = None       # [B, n_iso] bool

    # row validity: False for trailing-batch padding duplicates (the loader
    # pads the last partial batch by repeating the final sample; metrics and
    # artifact dumps must skip those rows). None means all rows are real.
    sample_valid: Optional[Array] = None   # [B] bool

    @property
    def batch_size(self) -> int:
        return self.lig_feat.shape[0]

    @property
    def n_lig(self) -> int:
        return self.lig_feat.shape[1]

    @property
    def n_pocket(self) -> int:
        return self.pocket_idx.shape[1]

    @property
    def n_protein(self) -> int:
        return self.prot_feat.shape[1]


def dummy_batch(shapes, batch_size: int = 2, key=None,
                n_lig_valid: int | None = None,
                n_prot_valid: int | None = None,
                feat_dim: int = 56, prot_feat_dim: int = 1280) -> FABindBatch:
    """Random, self-consistent batch for tests/benchmarks."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    B = batch_size
    Nc, Np, Nr, Kb = (shapes.max_ligand, shapes.max_pocket,
                      shapes.max_protein, shapes.bond_k)
    nl = n_lig_valid or max(4, Nc // 2)
    nr = n_prot_valid or max(16, Nr // 2)

    lig_mask = jnp.arange(Nc)[None] < nl
    prot_mask = jnp.arange(Nr)[None] < nr
    lig_mask = jnp.broadcast_to(lig_mask, (B, Nc))
    prot_mask = jnp.broadcast_to(prot_mask, (B, Nr))

    prot_xyz = jax.random.normal(ks[0], (B, Nr, 3)) * 10.0
    prot_xyz = prot_xyz - jnp.mean(prot_xyz, axis=1, keepdims=True)
    lig_coords = jax.random.normal(ks[1], (B, Nc, 3)) * 3.0
    rdkit = lig_coords + 0.3 * jax.random.normal(ks[2], (B, Nc, 3))

    # chain bonds i <-> i+1, both directions
    idx = jnp.arange(Nc)
    bond_idx = jnp.zeros((B, Nc, Kb), jnp.int32)
    bond_idx = bond_idx.at[:, :, 0].set(jnp.maximum(idx - 1, 0))
    bond_idx = bond_idx.at[:, :, 1].set(jnp.minimum(idx + 1, Nc - 1))
    bond_mask = jnp.zeros((B, Nc, Kb), bool)
    bond_mask = bond_mask.at[:, :, 0].set(idx > 0)
    bond_mask = bond_mask.at[:, :, 1].set(idx + 1 < nl)
    bond_mask = bond_mask & lig_mask[:, :, None]

    las = jnp.zeros((B, Nc, Nc), bool)
    las = las.at[:, idx[:-1], idx[1:]].set(True)
    las = las.at[:, idx[1:], idx[:-1]].set(True)
    las = las & lig_mask[:, :, None] & lig_mask[:, None, :]

    # pocket = nearest residues to ligand centroid (mean over VALID atoms —
    # dividing by padded Nc would bias the pocket-center label the real
    # pipeline computes from real atoms only, batching.py build_sample)
    n_valid_lig = jnp.maximum(jnp.sum(lig_mask, axis=1), 1)[:, None]
    com = jnp.sum(jnp.where(lig_mask[..., None], lig_coords, 0.0),
                  axis=1) / n_valid_lig
    d = jnp.linalg.norm(prot_xyz - com[:, None], axis=-1)
    d = jnp.where(prot_mask, d, 1e9)
    n_keep = min(Np, nr)
    _, pocket_idx = jax.lax.top_k(-d, Np)
    pocket_idx = jnp.sort(pocket_idx, axis=1)
    pocket_mask = jnp.arange(Np)[None] < n_keep
    pocket_mask = jnp.broadcast_to(pocket_mask, (B, Np))
    pocket_idx = jnp.where(pocket_mask, pocket_idx, 0).astype(jnp.int32)

    label = jnp.zeros((B, Nr))
    label = jax.vmap(lambda l, i, m: l.at[i].set(m.astype(l.dtype)))(
        label, pocket_idx, pocket_mask)

    pkt_xyz = jax.vmap(lambda p, i: p[i])(prot_xyz, pocket_idx)
    pkt_center = jnp.sum(jnp.where(pocket_mask[..., None], pkt_xyz, 0.0), 1) / \
        jnp.maximum(jnp.sum(pocket_mask, 1), 1)[:, None]
    init = rdkit - (jnp.sum(jnp.where(lig_mask[..., None], rdkit, 0.0), 1,
                            keepdims=True)
                    / n_valid_lig[:, None]) + pkt_center[:, None]

    lr = jnp.max(jnp.where(lig_mask,
                           jnp.linalg.norm(lig_coords - com[:, None], axis=-1),
                           0.0), axis=1)

    return FABindBatch(
        lig_feat=jax.random.normal(ks[3], (B, Nc, feat_dim)),
        lig_mask=lig_mask,
        lig_coords=lig_coords * lig_mask[..., None],
        lig_coords_init=init * lig_mask[..., None],
        lig_rdkit_coords=rdkit * lig_mask[..., None],
        bond_idx=bond_idx,
        bond_mask=bond_mask,
        las_adj=las,
        prot_feat=jax.random.normal(ks[4], (B, Nr, prot_feat_dim)),
        prot_mask=prot_mask,
        prot_xyz=prot_xyz * prot_mask[..., None],
        pocket_idx=pocket_idx,
        pocket_mask=pocket_mask,
        pocket_label=label,
        coords_center=com,
        ligand_radius=lr,
        pocket_residue_center=pkt_center,
    )
