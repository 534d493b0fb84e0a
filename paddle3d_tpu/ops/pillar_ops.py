"""Fused pillar pipeline: raw points → decorated features → BEV canvas.

TPU-native collapse of the reference's three-stage pipeline
(hard_voxelize custom op → PillarFeatureNet → PointPillarsScatter;
reference: paddle3d/ops/voxel/voxelize_op.cu:63-182,
paddle3d/models/voxel_encoders/pillar_encoder.py:64,109,
paddle3d/models/middle_encoders/pillar_scatter.py:34). The [V, P, C] voxel
buffer never exists: one multi-operand `lax.sort` groups points by cell,
log-depth segmented scans (ops/segmented.py) compute per-pillar means and
the post-MLP max, and the Pallas sorted-scatter kernel places each pillar's
feature row straight onto the canvas. v5e: replaces ~59 ms of
voxelize+PFN+scatter with ~6 ms for the KITTI 8×20k-point batch.

Numerics match the buffer path exactly in eval mode (same decoration, same
first-`max_points` capping by arrival order via the stable sort); in train
mode BatchNorm batch statistics are computed over sorted point rows instead
of the [V, P]-padded buffer, which differs only in the padding fraction.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .segmented import (blocked_cumsum, seg_broadcast_from_bounded,
                        seg_prefix_max_bounded, seg_prefix_sum_bounded)
from .voxelize import points_to_voxel_coords

__all__ = ["pillar_decorate_sorted", "pillar_emit_rows",
           "fused_pillar_canvas"]

_SENTINEL = 2**31 - 1


@functools.partial(
    jax.jit, static_argnames=("voxel_size", "point_cloud_range"))
def sort_points_by_cell(points: jnp.ndarray,
                        voxel_size: Tuple[float, ...],
                        point_cloud_range: Tuple[float, ...]):
    """One sample's points -> (sorted keys [N], sorted point columns [C, N]).

    The multi-operand sort's column outputs ARE the channel-major layout the
    fused PFN kernel wants — stacking on axis 0 is free."""
    n, c = points.shape
    pc_range = jnp.asarray(point_cloud_range, dtype=jnp.float32)
    vsize = jnp.asarray(voxel_size, dtype=jnp.float32)
    grid = jnp.round((pc_range[3:6] - pc_range[0:3]) / vsize).astype(jnp.int32)
    nx = grid[0]
    coords_xyz, valid = points_to_voxel_coords(points, voxel_size,
                                               point_cloud_range)
    key = jnp.where(valid,
                    coords_xyz[:, 1] * nx + coords_xyz[:, 0],
                    jnp.int32(_SENTINEL))
    cols = [points[:, i] for i in range(c)]
    sorted_ops = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
    return sorted_ops[0], jnp.stack(sorted_ops[1:], axis=0)


def pfn_folded_weights(pfn):
    """Eval-mode BN-folded transposed weights for the fused PFN kernel.

    LinearBN1DReLU: y = relu(bn(x @ W)); with running stats the BN is the
    per-channel affine (scale s, shift c), so y = relu(x @ (W·s) + c).
    Returns (w1t [u1, C_dec], b1 [u1, 1], w2t [u2, 2·u1] | None, b2)."""
    def fold(layer):
        w = layer.mlp.linear.kernel.value
        bn = layer.mlp.bn
        s = (bn.scale.value.astype(jnp.float32) /
             jnp.sqrt(bn.var.value.astype(jnp.float32) + bn.epsilon))
        c = (bn.bias.value.astype(jnp.float32) -
             bn.mean.value.astype(jnp.float32) * s)
        wt = (w.astype(jnp.float32) * s[None, :]).T.astype(w.dtype)
        return wt, c[:, None].astype(jnp.float32)

    w1t, b1 = fold(pfn.pfn_layers[0])
    if len(pfn.pfn_layers) == 2:
        w2t, b2 = fold(pfn.pfn_layers[1])
        return w1t, b1, w2t, b2
    return w1t, b1, None, None


def _pallas_eval_ok(pfn) -> bool:
    """Kernel path preconditions: 1-2 PFN layers in eval mode (running-stat
    BN — the fold in pfn_folded_weights is only valid then), no QAT
    fake-quant wrappers (folding would silently skip the quantizers)."""
    if len(pfn.pfn_layers) > 2:
        return False
    for layer in pfn.pfn_layers:
        if type(layer.mlp.linear).__name__ == "_QuantWrapper":
            return False
        if not layer.mlp.bn.use_running_average:
            return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "point_cloud_range", "max_points_in_voxel",
                     "max_voxels", "with_distance"))
def pillar_decorate_sorted(points: jnp.ndarray,
                           voxel_size: Tuple[float, ...],
                           point_cloud_range: Tuple[float, ...],
                           max_points_in_voxel: int,
                           max_voxels: int,
                           with_distance: bool = False):
    """Sort one sample's points by pillar cell and build PFN input features.

    points: [N, C>=3] (NaN-padded). Returns a dict of [N]-aligned arrays:
      decorated [N, C+5(+1)]  PFN input rows (zeroed where not kept),
      keys      [N] int32     ascending cell keys (sentinel for dropped),
      head/tail [N] bool      segment boundaries,
      keep      [N] bool      row participates in its pillar (rank < P, cap),
      emit      [N] bool      row carries the pillar's output (segment tail).
    """
    n, c = points.shape
    pc_range = jnp.asarray(point_cloud_range, dtype=jnp.float32)
    vsize = jnp.asarray(voxel_size, dtype=jnp.float32)
    grid = jnp.round((pc_range[3:6] - pc_range[0:3]) / vsize).astype(jnp.int32)
    nx = grid[0]

    coords_xyz, valid = points_to_voxel_coords(points, voxel_size,
                                               point_cloud_range)
    key = jnp.where(valid,
                    coords_xyz[:, 1] * nx + coords_xyz[:, 0],
                    jnp.int32(_SENTINEL))

    # one stable multi-operand sort carries the payload with the keys —
    # no post-hoc gather (XLA row gathers are O(source) on TPU)
    cols = [points[:, i] for i in range(c)]
    sorted_ops = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
    skey = sorted_ops[0]
    spts = jnp.stack(sorted_ops[1:], axis=-1)

    svalid = skey < _SENTINEL
    head = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & svalid
    # tail from the KEY boundary, not tail_flags(head): head is masked by
    # svalid, so the valid→sentinel transition carries no head flag and the
    # last valid pillar of the scan would silently lose its emission row
    next_key = jnp.concatenate(
        [skey[1:], jnp.full((1,), _SENTINEL, skey.dtype)])
    tail = svalid & (skey != next_key)
    # in-segment rank via BOUNDED key-guarded doubling (exact up to the cap,
    # clamped ≥ cap beyond it — all this needs; see segmented.py rationale:
    # full associative_scan costs ~50-90 ms at 250k rows on v5e)
    rcount = seg_prefix_sum_bounded(
        jnp.ones((n,), jnp.int32), skey, max_points_in_voxel + 1)
    rank = rcount - 1
    # pillar ordinal for the voxel cap: the one remaining GLOBAL prefix op,
    # done as a cheap two-level blocked cumsum on a single int channel
    voxel_id = blocked_cumsum(head.astype(jnp.int32)) - 1
    keep = (svalid & (rank < max_points_in_voxel) & (voxel_id < max_voxels))
    # the pillar's emission row: its LAST KEPT row (replaces the segment
    # tail so every later reduction spans ≤ max_points rows)
    emit = keep & (tail | (rank == max_points_in_voxel - 1))

    fkeep = keep[:, None].astype(spts.dtype)
    xyz = spts[:, :3]
    sums = seg_prefix_sum_bounded(
        jnp.concatenate([xyz, jnp.ones((n, 1), spts.dtype)], -1) * fkeep,
        skey, max_points_in_voxel)
    sums = seg_broadcast_from_bounded(sums, emit, skey, max_points_in_voxel)
    count = jnp.maximum(sums[:, 3:4], 1.)
    mean = sums[:, :3] / count

    # pillar geometric center from the cell key (reference: non-legacy
    # f_center, pillar_encoder.py:109)
    x_coord = (skey % jnp.maximum(nx, 1)).astype(spts.dtype)
    y_coord = (skey // jnp.maximum(nx, 1)).astype(spts.dtype)
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    cx = x_coord * vx + (vx / 2 + float(point_cloud_range[0]))
    cy = y_coord * vy + (vy / 2 + float(point_cloud_range[1]))

    feats = [spts, xyz - mean,
             (spts[:, 0] - cx)[:, None], (spts[:, 1] - cy)[:, None]]
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    decorated = jnp.concatenate(feats, axis=-1) * fkeep

    return dict(decorated=decorated, keys=jnp.where(emit | svalid, skey,
                                                    jnp.int32(_SENTINEL)),
                head=head, tail=tail, keep=keep, emit=emit)


def pillar_emit_rows(feats: jnp.ndarray, keys: jnp.ndarray,
                     keep: jnp.ndarray, emit: jnp.ndarray,
                     max_points: int) -> jnp.ndarray:
    """Per-point MLP outputs → rows carrying each pillar's max at its
    emission row (zero elsewhere); feed to sorted_segment_sum with the
    sorted keys for the canvas placement. The emission row is the pillar's
    last KEPT row, so a bounded prefix max over ≤ max_points rows covers
    the whole kept prefix."""
    masked = jnp.where(keep[:, None], feats, jnp.asarray(-1e9, feats.dtype))
    segmax = seg_prefix_max_bounded(masked, keys, max_points)
    return jnp.where(emit[:, None], segmax, 0.).astype(feats.dtype)


def fused_pillar_canvas(voxelizer, pfn, middle_encoder, points,
                        training: bool, with_occupancy: bool = False):
    """Shared fused points→canvas pipeline for any PillarFeatureNet depth.

    Multi-layer PFNs (e.g. CenterPoint-nuScenes feat_channels [64, 64],
    reference pillar_encoder.py:64 PFNLayer concat of per-pillar max)
    interleave per-row MLPs with segment-max broadcasts over the sorted
    rows; the final layer's per-pillar max lands on the canvas via the
    Pallas sorted-scatter kernel. Eval-mode numerics match the [V, P, C]
    buffer path exactly (kept rows see identical inputs; masked rows are
    zeroed before every MLP as the buffer path's padding is).

    Returns canvas [B, ny, nx, C] (+ occupancy [B, ny, nx] when
    with_occupancy, computed as a free extra scatter channel).
    """
    from .pallas.sorted_scatter import (sorted_segment_sum,
                                        sorted_segment_sum_split)
    from .segmented import seg_window_max_bounded

    max_points = pfn.max_num_points_in_voxel
    use_pallas = (not training and jax.default_backend() == "tpu"
                  and _pallas_eval_ok(pfn))
    if use_pallas:
        return _fused_pillar_canvas_pallas(voxelizer, pfn, middle_encoder,
                                           points, with_occupancy)
    if (training and jax.default_backend() == "tpu"
            and _pallas_train_ok(pfn)):
        return _fused_pillar_canvas_pallas_train(
            voxelizer, pfn, middle_encoder, points, with_occupancy)
    dec = jax.vmap(functools.partial(
        pillar_decorate_sorted,
        voxel_size=tuple(voxelizer.voxel_size),
        point_cloud_range=tuple(voxelizer.point_cloud_range),
        max_points_in_voxel=max_points,
        max_voxels=voxelizer.max_num_voxels_for(training),
        with_distance=pfn.with_distance))(points)
    keys, keep, emit = dec["keys"], dec["keep"], dec["emit"]

    x = dec["decorated"]
    # decoration math runs f32 (pc_range/voxel offsets); the NETWORK runs
    # in the weight dtype — under AMP O2 this keeps the whole canvas path
    # (and the scatter kernel's VMEM scratch) in bf16
    w_dtype = pfn.pfn_layers[0].mlp.linear.kernel.value.dtype
    if x.dtype != w_dtype:
        x = x.astype(w_dtype)
    n_layers = len(pfn.pfn_layers)
    rows = None
    # The Pallas window-max kernel (ops/pallas/seg_window.py) is exact-
    # parity but measured NEUTRAL-to-slower than the XLA doubling on v5e
    # (19.8 vs 17.9 ms fwd, 56.7 vs 52.6 ms grad at [8,250k,64] bf16):
    # the op is VPU-bound, not HBM-bound, and Mosaic's f32-upcast compare
    # costs more than XLA's fused bf16 selects. Kept off until a packed-
    # lane variant wins; flip to `jax.default_backend() == "tpu"` to use.
    use_seg_kernel = False

    def batched_winmax(masked):
        if use_seg_kernel:
            from .pallas.seg_window import seg_window_max
            return seg_window_max(masked, keys, max_points)
        return jax.vmap(
            lambda m, k: seg_window_max_bounded(m, k, max_points))(
            masked, keys)

    for i, layer in enumerate(pfn.pfn_layers):
        # flax BatchNorm computes train-mode stats in f32 and promotes the
        # output — cast back so the scatter kernel sees the compute dtype
        y = layer.mlp(x).astype(w_dtype)
        if i < n_layers - 1:
            masked = jnp.where(keep[..., None], y,
                               jnp.asarray(-1e9, y.dtype))
            segmax = batched_winmax(masked)
            x = jnp.concatenate([y, segmax], axis=-1)
            if training:
                # zero masked rows so train-mode BN statistics see the
                # same zero padding the buffer path's masked voxels do;
                # eval-mode BN uses running stats, so kept rows are exact
                # either way and the extra pass is skipped
                x = jnp.where(keep[..., None], x, 0.)
        elif use_seg_kernel:
            # emit row is the pillar's LAST kept row and kept ranks are
            # < max_points, so the centered window max over kept rows
            # equals the prefix max pillar_emit_rows computes
            masked = jnp.where(keep[..., None], y,
                               jnp.asarray(-1e9, y.dtype))
            segmax = batched_winmax(masked)
            rows = jnp.where(emit[..., None], segmax, 0.).astype(y.dtype)
        else:
            rows = jax.vmap(
                lambda f, k, kp, e: pillar_emit_rows(f, k, kp, e,
                                                     max_points))(
                y, keys, keep, emit)

    ny, nx = middle_encoder.ny, middle_encoder.nx
    b = points.shape[0]
    if with_occupancy:
        occ = dec["emit"][..., None].astype(rows.dtype)
        rows = jnp.concatenate([rows, occ], axis=-1)
        # split-output kernel: the occupancy side-channel lands in its own
        # buffer, so the canvas needs no channel-slice (a lane-retiling
        # copy measured at 1.34 ms/iter on the KITTI bench)
        table, occ_t = sorted_segment_sum_split(dec["keys"], rows, ny * nx)
        canvas = table.reshape(b, ny, nx, -1)
        occupancy = occ_t.reshape(b, ny, nx)
        return canvas, occupancy
    table = sorted_segment_sum(dec["keys"], rows, ny * nx)
    return table.reshape(b, ny, nx, -1)


def _pallas_train_ok(pfn) -> bool:
    """Train kernel preconditions: single-layer PFN in batch-stat BN mode,
    no QAT wrappers (the two-pass stats+fold path implements the full
    training BatchNorm VJP only for one layer; multi-layer PFNs keep the
    XLA segmented path)."""
    if len(pfn.pfn_layers) != 1:
        return False
    layer = pfn.pfn_layers[0]
    if type(layer.mlp.linear).__name__ == "_QuantWrapper":
        return False
    if layer.mlp.bn.use_running_average:
        return False
    return True


def _fused_pillar_canvas_pallas_train(voxelizer, pfn, middle_encoder,
                                      points, with_occupancy: bool,
                                      interpret: bool = False):
    """TRAIN points→canvas via the two-pass fused PFN + custom VJP
    (ops/pallas/fused_pfn_train.py): stats kernel → batch-stat-folded eval
    kernel → sorted scatter, with the full training-BatchNorm backward in
    one kernel pass. Closes the round-2..4 eval/train asymmetry: training
    now runs the same fused extract the deploy path does (reference
    contract: paddle3d/models/voxel_encoders/pillar_encoder.py:64-109)."""
    from .pallas.fused_pfn_train import fused_pfn_train_rows
    from .pallas.sorted_scatter import (sorted_segment_sum,
                                        sorted_segment_sum_split)

    vsize = tuple(voxelizer.voxel_size)
    pc_range = tuple(voxelizer.point_cloud_range)
    keys, pts_t = jax.vmap(functools.partial(
        sort_points_by_cell, voxel_size=vsize,
        point_cloud_range=pc_range))(points)

    layer = pfn.pfn_layers[0]
    w1t = layer.mlp.linear.kernel.value.T          # [u1, C_dec]
    bn = layer.mlp.bn
    rows_t, mu, var = fused_pfn_train_rows(
        keys, pts_t, w1t, bn.scale.value, bn.bias.value,
        pfn.max_num_points_in_voxel,
        voxelizer.max_num_voxels_for(True),
        middle_encoder.nx, pfn.vx, pfn.vy, pfn.x_offset, pfn.y_offset,
        pfn.with_distance, with_occupancy, interpret)
    # flax BatchNorm running-stat update (momentum convention)
    mom = bn.momentum
    bn.mean.value = (mom * bn.mean.value
                     + (1 - mom) * mu.astype(bn.mean.value.dtype))
    bn.var.value = (mom * bn.var.value
                    + (1 - mom) * var.astype(bn.var.value.dtype))

    ny, nx = middle_encoder.ny, middle_encoder.nx
    b = points.shape[0]
    rows = jnp.swapaxes(rows_t, 1, 2)              # [B, N, u(+1)]
    if with_occupancy:
        table, occ_t = sorted_segment_sum_split(keys, rows, ny * nx)
        return (table.reshape(b, ny, nx, -1), occ_t.reshape(b, ny, nx))
    table = sorted_segment_sum(keys, rows, ny * nx)
    return table.reshape(b, ny, nx, -1)


def _fused_pillar_canvas_pallas(voxelizer, pfn, middle_encoder, points,
                                with_occupancy: bool,
                                interpret: bool = False):
    """Eval-mode points→canvas via the fused PFN Pallas kernel
    (ops/pallas/fused_pfn.py): sort → ONE kernel pass → sorted scatter.

    Dense scans (nuScenes 250k-point 10-sweep: mean rows/block ≫ the DMA
    window) take the channel-major kernel, which consumes the PFN kernel's
    native [B, C, N] layout with no transpose / lane pad between the two
    (CenterPoint 170.5 → 216 scans/s on v5e). Sparse scans (KITTI 20k pts)
    keep the row-major split kernel — measured faster there (517 vs 504)."""
    from .pallas.fused_pfn import fused_pfn_rows
    from .pallas.sorted_scatter import (pick_cells_per_block, _CAP,
                                        sorted_segment_sum,
                                        sorted_segment_sum_split,
                                        sorted_segment_sum_cm)

    vsize = tuple(voxelizer.voxel_size)
    pc_range = tuple(voxelizer.point_cloud_range)
    keys, pts_t = jax.vmap(functools.partial(
        sort_points_by_cell, voxel_size=vsize,
        point_cloud_range=pc_range))(points)

    w1t, b1, w2t, b2 = pfn_folded_weights(pfn)
    ny, nx = middle_encoder.ny, middle_encoder.nx
    b, n = keys.shape
    num_cells = ny * nx
    nblocks = -(-num_cells // pick_cells_per_block(num_cells))
    dense = -(-n // max(nblocks, 1)) > 2 * _CAP

    rows_t = fused_pfn_rows(
        keys, pts_t, w1t, b1, w2t, b2,
        n_layers=len(pfn.pfn_layers),
        P=pfn.max_num_points_in_voxel,
        maxV=voxelizer.max_num_voxels_for(False),
        nx=nx, vx=pfn.vx, vy=pfn.vy, x_off=pfn.x_offset, y_off=pfn.y_offset,
        with_distance=pfn.with_distance, occupancy=with_occupancy,
        interpret=interpret, padded_out=dense and not interpret)
    if dense and not interpret:
        if with_occupancy:
            table, occ_t = sorted_segment_sum_cm(keys, rows_t, num_cells,
                                                 split_last=True)
            return (table.reshape(b, ny, nx, -1),
                    occ_t.reshape(b, ny, nx))
        table = sorted_segment_sum_cm(keys, rows_t, num_cells)
        return table.reshape(b, ny, nx, -1)

    rows = jnp.swapaxes(rows_t, 1, 2)            # [B, N, C(+1)]
    if with_occupancy:
        table, occ_t = sorted_segment_sum_split(keys, rows, num_cells)
        return (table.reshape(b, ny, nx, -1),
                occ_t.reshape(b, ny, nx))
    table = sorted_segment_sum(keys, rows, num_cells)
    return table.reshape(b, ny, nx, -1)
