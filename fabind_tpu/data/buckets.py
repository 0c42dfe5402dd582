"""Automatic shape-bucket inference.

Shape buckets are the TPU-native replacement for the reference's per-sample
dynamic torch shapes (see DESIGN.md "Measured performance"): each complex
runs in the smallest bucket it fits, one jit specialization per bucket.
Picking the buckets by hand requires knowing the dataset's size
distribution; `suggest_buckets` measures it and proposes a small set that
minimizes padded compute under the profiled cost model (the per-recycle hot
path is dominated by the pair chains, cost ∝ (1+Nc)·(1+Np), with an
O(Nr) whole-protein pocket-prediction term).

No reference counterpart: the reference pays ragged-batch overhead per
sample instead.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from fabind_tpu.config import FABindConfig


def measure_sizes(source, indices: Sequence, cfg: FABindConfig,
                  group: str = "test", limit: Optional[int] = None
                  ) -> np.ndarray:
    """[n, 3] int array of (n_ligand, n_pocket, n_protein) per sample.

    Builds samples host-side (featurization only, no device work); `limit`
    subsamples evenly for large datasets."""
    from fabind_tpu.data.batching import build_sample

    idx = list(indices)
    if limit is not None and len(idx) > limit:
        idx = [idx[i] for i in
               np.linspace(0, len(idx) - 1, limit).astype(int)]
    rng = np.random.RandomState(0)
    sizes = []
    for i in idx:
        raw = source.get(i)
        s = build_sample(raw, cfg, group=group, rng=rng)
        sizes.append((s["lig_feat"].shape[0], len(s["pocket_idx"]),
                      s["prot_xyz"].shape[0]))
    # keep 2-D for empty inputs so suggest_buckets can fall back cleanly
    return np.asarray(sizes, np.int64).reshape(-1, 3)


def _pad8(v: int) -> int:
    return int(-(-v // 8) * 8)


# Measured per-variant protein weights for _cost (tools/
# calibrate_bucket_cost.py: least-squares fit of the real-chip train-step
# time over a (pkt, prot) grid at cli.train's remat-on fp32 config).
# FABind+ measured 2026-08-21 (TPU v5e, b12, lig 48): protein_weight
# -0.036 ± ~0.1 (fit_max_rel_err 9%) with pair_coef 70.3 µs/unit and a
# 279 ms shape-independent constant — the 6-layer pair-embed-threaded
# docking stack dominates so completely that the whole-protein pocket-pred
# stage is within measurement noise of FREE. Base measured 2026-08-21 the
# same way: protein_weight 0.040 (pair 33.2 µs/unit, prot 1.3 µs/unit,
# 68 ms constant, fit_max_rel_err 10%) — the round-3 guess of 0.25 was 6x
# too heavy and made the cost-keyed bucket DP trade real pair padding for
# near-free protein padding (measured 22.6 -> 18.9 c/s e2e). Both stored
# as 0.05 (small positive) so candidate buckets still tie-break toward
# less protein padding instead of treating it as exactly costless.
_PROTEIN_WEIGHT = {"fabind": 0.05, "fabind_plus": 0.05}


def _cost(sizes: np.ndarray, dims: Tuple[int, int, int],
          protein_weight: float = 0.25) -> float:
    """Padded compute for `sizes` run at bucket `dims`: pair-chain term
    (1+Nc)(1+Np) + the whole-protein pocket-pred term (lighter hidden dim,
    weighted by the variant's measured `protein_weight`)."""
    lig, pkt, prot = dims
    return len(sizes) * ((1 + lig) * (1 + pkt)
                         + protein_weight * (1 + lig) * (1 + prot))


def suggest_buckets(sizes: np.ndarray, cfg: FABindConfig, k: int = 3,
                    pocket_headroom: int = 8) -> List:
    """Partition the size distribution into ≤ k buckets (exact DP over a
    sorted size key) and return a small->large list of ShapeConfig suitable
    for `Loader(buckets=...)` / `DockingEngine(buckets=...)`.

    The largest bucket always equals cfg.shapes so nothing is dropped that
    the base config would have accepted; dims are rounded up to multiples
    of 8 (sublane-friendly) and clamped to cfg.shapes.

    pocket_headroom residues are added on top of each group's measured
    pocket maximum: `measure_sizes` sees the GT-centered crop, but at
    eval/serve time the PREDICTED-center crop can keep more residues than
    that measurement (the scale hazard in DESIGN.md — truncation is counted
    per sample as pocket_overflow / Pose.pocket_truncated, but headroom
    avoids paying it on typical center excursions).
    """
    base = cfg.shapes
    w = _PROTEIN_WEIGHT.get(cfg.model.variant, 0.25)
    fit = (sizes[:, 0] <= base.max_ligand) & (sizes[:, 2] <= base.max_protein)
    sizes = sizes[fit]
    if sizes.shape[0] == 0 or k <= 1:
        return [base]

    # Sort by the per-sample cost under the variant's measured model (pair
    # term + weighted whole-protein term), not the pair term alone: the DP
    # partitions CONTIGUOUS runs of this key, so a pair-only key lets a
    # small-pair/huge-protein sample land in a small bucket and force that
    # bucket's protein dim to its own size — measured round 4 as the
    # (lig 32, pkt 152, prot 504) dominant bucket on a median-prot-250
    # store (DESIGN.md "Sustained end-to-end training").
    key = ((1 + sizes[:, 0]).astype(np.float64) * (1 + sizes[:, 1])
           + w * (1 + sizes[:, 0]) * (1 + sizes[:, 2]))
    order = np.argsort(key)
    s = sizes[order]
    n = s.shape[0]

    def group_dims(i: int, j: int) -> Tuple[int, int, int]:
        """Bucket dims covering sorted samples i..j inclusive (group maxima
        over ALL axes — the key orders by pair cost, so per-axis maxima
        must be recomputed per group; n is capped by measure_sizes'
        `limit`, so the O(n) scan inside the O(n^2 k) DP is fine)."""
        m = np.max(s[i:j + 1], axis=0)
        return (min(_pad8(int(m[0])), base.max_ligand),
                min(_pad8(int(m[1]) + pocket_headroom), base.max_pocket),
                min(_pad8(int(m[2])), base.max_protein))

    # DP: best[j][g] = min cost covering first j samples with g groups
    INF = float("inf")
    best = np.full((n + 1, k + 1), INF)
    back = np.zeros((n + 1, k + 1), np.int64)
    best[0, 0] = 0.0
    for j in range(1, n + 1):
        for g in range(1, k + 1):
            for i in range(j):
                if best[i, g - 1] == INF:
                    continue
                c = best[i, g - 1] + _cost(s[i:j], group_dims(i, j - 1), w)
                if c < best[j, g]:
                    best[j, g] = c
                    back[j, g] = i
    g = int(np.argmin(best[n, 1:]) + 1)
    cuts = []
    j = n
    while g > 0:
        i = int(back[j, g])
        cuts.append((i, j - 1))
        j, g = i, g - 1
    cuts.reverse()

    dims = [group_dims(i, j) for i, j in cuts]
    shapes = []
    seen = set()
    for lig, pkt, prot in dims:
        t = (lig, pkt, prot)
        if t in seen:
            continue
        seen.add(t)
        shapes.append(dataclasses.replace(base, max_ligand=lig,
                                          max_pocket=pkt, max_protein=prot))
    # the drop boundary stays the configured maximum
    if not any(sh.max_ligand == base.max_ligand
               and sh.max_pocket == base.max_pocket
               and sh.max_protein == base.max_protein for sh in shapes):
        shapes.append(base)
    shapes.sort(key=lambda sh: (sh.max_ligand, sh.max_pocket, sh.max_protein))
    return shapes


def resolve_buckets(spec: Optional[str], cfg: FABindConfig, source=None,
                    indices: Optional[Sequence] = None, group: str = "test",
                    limit: int = 512, pocket_headroom: int = 8,
                    single: bool = False) -> Optional[List]:
    """Parse a CLI bucket spec into a small->large ShapeConfig list.

    Accepted specs (shared by cli.train / cli.evaluate / cli.serve):
      - None / "" / "none"   -> None (single cfg.shapes bucket)
      - "auto" / "auto:K"    -> measure the split's size distribution and
                                infer up to K (default 3) buckets
      - "l:p:r[,l:p:r...]"   -> explicit dims

    With `single=True`, "auto" sizes ONE bucket at the measured maxima
    (padded, + pocket headroom, clamped to cfg.shapes) instead of a
    multi-bucket partition. (No in-repo caller anymore: multi-host dp now
    runs real buckets through the Loader's globally-deterministic schedule,
    dataset.py:_epoch_global_schedule; kept for max-shape sizing uses.)"""
    if not spec or spec == "none":
        return None
    if spec.startswith("auto"):
        if source is None or indices is None:
            raise ValueError("--buckets auto needs a dataset to measure")
        k = int(spec.split(":")[1]) if ":" in spec else 3
        sizes = measure_sizes(source, indices, cfg, group=group, limit=limit)
        if single:
            base = cfg.shapes
            fit = ((sizes[:, 0] <= base.max_ligand)
                   & (sizes[:, 2] <= base.max_protein))
            sizes = sizes[fit]
            if sizes.shape[0] == 0:
                return [base]
            m = np.max(sizes, axis=0)
            return [dataclasses.replace(
                base,
                max_ligand=min(_pad8(int(m[0])), base.max_ligand),
                max_pocket=min(_pad8(int(m[1]) + pocket_headroom),
                               base.max_pocket),
                max_protein=min(_pad8(int(m[2])), base.max_protein))]
        return suggest_buckets(sizes, cfg, k=k,
                               pocket_headroom=pocket_headroom)
    buckets = []
    for part in spec.split(","):
        ml, mp, mr = (int(v) for v in part.split(":"))
        buckets.append(dataclasses.replace(
            cfg.shapes, max_ligand=ml, max_pocket=mp, max_protein=mr))
    return buckets


def sort_bucket_cfgs(cfg, buckets):
    """[FABindConfig per bucket], smallest->largest, largest must cover
    cfg.shapes. The single source of bucket-list validation shared by the
    Loader and the DockingEngine."""
    import dataclasses
    bs = sorted(buckets or [cfg.shapes],
                key=lambda s: (s.max_ligand, s.max_pocket, s.max_protein))
    last = bs[-1]
    assert (last.max_ligand >= cfg.shapes.max_ligand
            and last.max_protein >= cfg.shapes.max_protein), \
        "largest bucket must cover cfg.shapes"
    return [dataclasses.replace(cfg, shapes=s) for s in bs]


def route_sample(s, bucket_cfgs):
    """Smallest bucket the sample fits, or None (oversize).

    The pocket-size constraint only picks BETWEEN buckets: the largest
    bucket accepts any pocket count (the Np crop truncates with the
    pocket_overflow counter — the pre-bucket behavior). Shared by the
    Loader and the DockingEngine so train-time and serve-time routing can
    never diverge."""
    n_lig = s["lig_feat"].shape[0]
    n_prot = s["prot_xyz"].shape[0]
    n_pkt = len(s["pocket_idx"])
    for i, c in enumerate(bucket_cfgs):
        sc = c.shapes
        last = i == len(bucket_cfgs) - 1
        if (n_lig <= sc.max_ligand and n_prot <= sc.max_protein
                and (last or n_pkt <= sc.max_pocket)
                and s["bond_deg"] <= sc.bond_k):
            return c
    return None
