"""Sorted-window sparse 3D convolution as a Pallas TPU kernel.

Replaces the searchsorted + 27-way row-gather formulation of
ops/sparse.py (measured 2.2 s per subm conv at B8/V60k on v5e — XLA
lowers both the binary search and the gather to serial dynamic indexing)
with the same structure that made the pillar scatter fast
(ops/pallas/sorted_scatter.py):

  * active voxels are SORTED by linear key (z*H*W + y*W + x) — the
    voxelizer and downsample_coords emit exactly this order, and
    submanifold convs preserve it;
  * for a block of cpb consecutive output voxels and a z-offset group
    (dz in {-1,0,1}), ALL kernel-window neighbors live in ONE contiguous
    sorted-row window (keys are monotone): one block DMA, no gather;
  * in-window matching is a one-hot compare + MXU matmul:
    part = (win_keys == qkey + delta) @ win_feats, then part @ W_delta,
    accumulated over the 27 taps — duplicate-free because keys are unique;
  * cross-step DMA double buffering: each grid step prefetches the NEXT
    (b, blk) step's query block and all nz group windows into the other
    buffer parity, so transfer latency hides behind the 27 matmuls
    (the un-pipelined version measured 64 ms/conv at B8 V160k — pure DMA
    round-trip serialization; compute is identical at C16 and C128).

Out-of-grid taps are masked by a PRECOMPUTED per-voxel boundary bitmask
(Mosaic has no vector int div/mod by arbitrary constants; x-wraparound
across rows can never false-match). Windows larger than WIN fall to a
serial chunk loop (same pattern as sorted_scatter's slow path).

Covers submanifold (qbase = own keys) and strided convs (qbase = linear
key of out_coord * stride — also monotone) with one kernel.

Negative result (r5), kept so the idea is not re-tried: a BEV-sparse,
z-dense [cols, D, C] column layout ("9 BEV taps x dense z-matmuls") does
NOT pay on LiDAR occupancies. Measured on the bench's clustered 250k-pt
scans at the CenterPoint-0075 grid, columns hold only 1.17-1.59 voxels
(stride 1/2/4/8: 239k vox over 200k cols; 198k/143k; 121k/76k; 30k/25k),
so column rows are D/1.4 x wider while only 1.4x fewer: the one-hot
gather-dot MACs scale as (9 taps x cols x D*C) vs (27 x vox x C) —
3-10x MORE work at D in {41,21,11,6}, plus a D x feature-memory blowup.
The win would require several voxels per column (dense urban z-stacks),
which these point clouds do not have.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sparse_conv3d_win"]

_LANE = 128


def _round_up(v, m):
    return -(-v // m) * m


def _kernel(D, H, W, cpb, WIN, cin_p, cout_p, nz, nb, relu,
            starts_ref, qbm_hbm, keys_hbm, feats_hbm, w_ref, aff_ref,
            out_ref, qbm_vm, keys_vm, feats_vm, sem_q, sem_k, sem_f):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    nbat = pl.num_programs(0)
    hw = H * W
    step = b * nb + blk

    def issue(buf, bb, kk):
        """Start the query-block DMA + every group's fast-path window DMA
        for grid step (bb, kk) into buffer parity `buf`. All-padding
        blocks (active flag 0) start nothing."""
        @pl.when(starts_ref[bb, nb * nz * 2 + kk] > 0)
        def _():
            cq = pltpu.make_async_copy(
                qbm_hbm.at[bb, :, pl.ds(kk * cpb, cpb)], qbm_vm.at[buf],
                sem_q.at[buf])
            cq.start()
            for g in range(nz):
                base = (kk * nz + g) * 2
                s = starts_ref[bb, base]
                s0 = pl.multiple_of((s // _LANE) * _LANE, _LANE)
                ck = pltpu.make_async_copy(
                    keys_hbm.at[bb, :, pl.ds(s0, WIN)], keys_vm.at[buf, g],
                    sem_k.at[buf, g])
                cf = pltpu.make_async_copy(
                    feats_hbm.at[bb, pl.ds(s0, WIN), :],
                    feats_vm.at[buf, g], sem_f.at[buf, g])
                ck.start()
                cf.start()

    # step 0 issues its own transfers; every step prefetches the next
    for buf in (0, 1):
        @pl.when((step == 0) & (step % 2 == buf))
        def _(buf=buf):
            issue(buf, b, blk)

        nxt_b = jnp.where(blk + 1 < nb, b, b + 1)
        nxt_k = jnp.where(blk + 1 < nb, blk + 1, 0)

        @pl.when((nxt_b < nbat) & ((step + 1) % 2 == buf))
        def _(buf=buf, nxt_b=nxt_b, nxt_k=nxt_k):
            issue(buf, nxt_b, nxt_k)

    buf = step % 2
    active = starts_ref[b, nb * nz * 2 + blk] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0] = jnp.zeros((cpb, cout_p), out_ref.dtype)

    @pl.when(active)
    def _():
        pltpu.make_async_copy(
            qbm_hbm.at[b, :, pl.ds(blk * cpb, cpb)], qbm_vm.at[buf],
            sem_q.at[buf]).wait()
        qb = qbm_vm[buf, 0]                             # [cpb] int32
        # per-voxel boundary bits precomputed in XLA: bit set = offset ok
        vm = qbm_vm[buf, 1]
        xlo = (vm & 1) != 0
        xhi = (vm & 2) != 0
        ylo = (vm & 4) != 0
        yhi = (vm & 8) != 0
        zlo = (vm & 16) != 0
        zhi = (vm & 32) != 0
        one_v = jnp.ones_like(xlo)

        def taps(acc, kw, fw, dz, zv):
            for dy in (-1, 0, 1):
                yv = zv & {-1: ylo, 0: one_v, 1: yhi}[dy]
                for dx in (-1, 0, 1):
                    v = yv & {-1: xlo, 0: one_v, 1: xhi}[dx]
                    tgt = jnp.where(v, qb + (dz * hw + dy * W + dx), -1)
                    oh = (kw == tgt[:, None]).astype(jnp.bfloat16)
                    part = jax.lax.dot_general(
                        oh, fw, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    kidx = (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)
                    acc = acc + jax.lax.dot_general(
                        part.astype(jnp.bfloat16), w_ref[kidx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return acc

        acc = jnp.zeros((cpb, cout_p), jnp.float32)
        zs = (-1, 0, 1) if nz == 3 else (0,)
        for g, dz in enumerate(zs):
            base = (blk * nz + g) * 2
            s = starts_ref[b, base]
            e = starts_ref[b, base + 1]
            s0 = pl.multiple_of((s // _LANE) * _LANE, _LANE)
            nch = jnp.maximum(pl.cdiv(jnp.maximum(e - s0, 0), WIN), 0)
            zv = {-1: zlo, 0: one_v, 1: zhi}[dz]

            # fast path: chunk 0 was prefetched
            pltpu.make_async_copy(
                keys_hbm.at[b, :, pl.ds(s0, WIN)], keys_vm.at[buf, g],
                sem_k.at[buf, g]).wait()
            pltpu.make_async_copy(
                feats_hbm.at[b, pl.ds(s0, WIN), :], feats_vm.at[buf, g],
                sem_f.at[buf, g]).wait()

            # rows outside the true span [s, e) can never match a target (keys
            # below lo_key / above hi_key bracket every target), so the fast
            # chunk is safe to consume unconditionally
            acc = taps(acc, keys_vm[buf, g],
                       feats_vm[buf, g].astype(jnp.bfloat16), dz, zv)

            # slow path: chunks >= 1 stream synchronously through slot g of
            # the CURRENT buffer (already consumed; the prefetch for the next
            # step lives in the other parity)
            def chunk(ci, acc, dz=dz, zv=zv, s0=s0, g=g):
                off = pl.multiple_of(s0 + ci * WIN, _LANE)
                ck = pltpu.make_async_copy(
                    keys_hbm.at[b, :, pl.ds(off, WIN)], keys_vm.at[buf, g],
                    sem_k.at[buf, g])
                cf = pltpu.make_async_copy(
                    feats_hbm.at[b, pl.ds(off, WIN), :], feats_vm.at[buf, g],
                    sem_f.at[buf, g])
                ck.start()
                cf.start()
                ck.wait()
                cf.wait()
                return taps(acc, keys_vm[buf, g],
                            feats_vm[buf, g].astype(jnp.bfloat16), dz, zv)

            acc = jax.lax.fori_loop(1, nch, chunk, acc)
            # the slow path clobbered slot g — restore chunk 0 for correctness
            # of the NEXT step's prefetch? No: the next step's windows live in
            # the other buffer parity; slot g is dead after this group.
        # fused epilogue (eval BN): acc already carries the folded per-
        # channel scale (in the weights); add the shift on VALID rows only
        # (vm == 0 <=> padding/sentinel row — those feature rows MUST stay
        # zero so downstream sentinel self-matches keep adding zeros), then
        # the optional relu.
        shift = aff_ref[0, :][None, :]                  # [1, cout_p]
        # reshape BEFORE the compare: Mosaic only supports minor-dim
        # insertion on 32-bit vectors, not i1
        valid = vm[:, None] != 0                        # [cpb, 1] sublanes
        acc = jnp.where(valid, acc + shift, 0.0)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0] = acc.astype(out_ref.dtype)



def _kernel_packed(H, W, cpb, WINP, P, group, cout_p, nz, nb, relu,
                   has_shift,
                   starts_ref, qbm_hbm, kpk_hbm, fpk_hbm, w_ref, aff_ref,
                   out_ref, qbm_vm, kpk_vm, fpk_vm,
                   sem_q, sem_k, sem_f):
    """PACKED grid step (P = 128/group voxels per 128-lane feature row).

    The per-tap one-hot match runs at PACKED-row granularity: keys are
    sorted, so each packed row owns a disjoint key range [kf, kl] and a
    target matches AT MOST ONE row — a 2-compare range test replaces the
    P-wide exact compare, and the match matmul contracts over WINP packed
    rows instead of WINP*P raw rows (P x fewer MACs, the C16/C32 stages'
    8x/4x lane-padding waste). Exactness is restored by a per-sub-position
    mask: a tiny key-valued dot gathers the selected row's P keys (split
    hi/lo 12-bit so f32 stays exact for any 32-bit key), and equality with
    the target picks the one group of `group` lanes that really matched —
    range-test false positives (target inside [kf, kl] but absent) zero
    out.

    Layout discipline: every per-tap tensor keeps the QUERY dim in LANES
    (ohT [WINP, cpb], partT [128, cpb], krowT [P, cpb], selT [group, cpb])
    so targets come straight from the lane-layout qbm block and no
    sublane-layout target copy (whose 2-lane DMA Mosaic rejects) or
    in-kernel transpose is needed; the final weight dot contracts selT's
    sublane dim and lands the accumulator back in [cpb, cout_p]."""
    b = pl.program_id(0)
    blk = pl.program_id(1)
    nbat = pl.num_programs(0)
    step = b * nb + blk

    def issue(buf, bb, kk):
        @pl.when(starts_ref[bb, nb * nz * 2 + kk] > 0)
        def _():
            pltpu.make_async_copy(
                qbm_hbm.at[bb, :, pl.ds(kk * cpb, cpb)], qbm_vm.at[buf],
                sem_q.at[buf]).start()
            for g in range(nz):
                sp0 = starts_ref[bb, (kk * nz + g) * 2]
                off = pl.multiple_of(sp0, 8)
                pltpu.make_async_copy(
                    kpk_hbm.at[bb, pl.ds(off, WINP), :], kpk_vm.at[buf, g],
                    sem_k.at[buf, g]).start()
                pltpu.make_async_copy(
                    fpk_hbm.at[bb, pl.ds(off, WINP), :], fpk_vm.at[buf, g],
                    sem_f.at[buf, g]).start()

    for buf in (0, 1):
        @pl.when((step == 0) & (step % 2 == buf))
        def _(buf=buf):
            issue(buf, b, blk)

        nxt_b = jnp.where(blk + 1 < nb, b, b + 1)
        nxt_k = jnp.where(blk + 1 < nb, blk + 1, 0)

        @pl.when((nxt_b < nbat) & ((step + 1) % 2 == buf))
        def _(buf=buf, nxt_b=nxt_b, nxt_k=nxt_k):
            issue(buf, nxt_b, nxt_k)

    buf = step % 2
    active = starts_ref[b, nb * nz * 2 + blk] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0] = jnp.zeros((cpb, cout_p), out_ref.dtype)

    @pl.when(active)
    def _():
        pltpu.make_async_copy(
            qbm_hbm.at[b, :, pl.ds(blk * cpb, cpb)], qbm_vm.at[buf],
            sem_q.at[buf]).wait()
        qb_l = qbm_vm[buf, 0][None, :]                  # [1, cpb] lanes
        vm_l = qbm_vm[buf, 1][None, :]
        masks_l = {0: (vm_l & 0) == 0}
        for bit, key in ((1, -101), (2, 101), (4, -100), (8, 100),
                         (16, -102), (32, 102)):
            masks_l[key] = (vm_l & bit) != 0

        def zgroup(acc, kpk, fpk, doffs):
            """Accumulate the 9 (dy,dx) taps of one z-offset group from a
            (WINP, 128) lane-padded packed-key / (WINP, 128) packed-feature
            window. Keys live in lanes [0, P); the pad lanes exist only
            because Mosaic requires HBM DMA slices to span full 128-lane
            tiles — they are sliced off before any use so their value is
            irrelevant.

            All 9 taps are BATCHED along lanes ([WINP, 9*cpb] one-hot, one
            gather dot, one stacked key dot): the per-tap formulation's 6
            narrow MXU invocations per tap drowned in fixed per-op
            overheads (measured SLOWER than the unpacked kernel at every
            stage shape despite P x fewer MACs). Keys are split into FOUR
            8-BIT PARTS (<= 255, exact in bf16): TPU matmuls at DEFAULT
            precision truncate f32 operands to one-pass bf16, so wider
            parts silently lose mantissa bits and break the exact-equality
            mask (chip-only corruption; CPU interpret is exact). With a
            one-hot ohT each gather dot has at most one nonzero term per
            column, so bf16 parts + f32 MXU accumulation are exact by
            construction."""
            base = kpk[0, 0]
            krel = kpk - base                            # exact int32
            kf = krel[:, 0:1]
            kl = krel[:, P - 1:P]
            krn = jax.lax.slice(krel, (0, 0), (WINP, P)).astype(jnp.uint32)
            # 4 x 8-bit parts stacked along lanes -> [WINP, 4*P]: ONE
            # narrow gather dot instead of four
            kparts = jnp.concatenate([
                jnp.bitwise_and(
                    jax.lax.shift_right_logical(krn, jnp.uint32(8 * p)),
                    jnp.uint32(255)).astype(jnp.int32).astype(jnp.bfloat16)
                for p in range(4)], axis=1)              # [WINP, 4P]
            fw = fpk.astype(jnp.bfloat16)

            # batched targets for the 9 (dy, dx) taps: [1, 9*cpb]
            tgts = []
            for (mz, my, mx, delta, kidx) in doffs:
                valid = masks_l[mz] & masks_l[my] & masks_l[mx]
                tgts.append(jnp.where(valid, qb_l + delta - base,
                                      -(2 ** 30)))
            tgt = jnp.concatenate(tgts, axis=1)          # [1, 9*cpb]

            ohT = ((kf <= tgt) & (tgt <= kl))            # [WINP, 9*cpb]
            ohTb = ohT.astype(jnp.bfloat16)
            partT = jax.lax.dot_general(
                fw, ohTb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [128, 9*cpb]
            krow = jax.lax.dot_general(
                kparts, ohTb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [4P, 9*cpb]
            tgt_u = tgt.astype(jnp.uint32)
            jm = None
            for p in range(4):
                tp = jnp.bitwise_and(
                    jax.lax.shift_right_logical(tgt_u, jnp.uint32(8 * p)),
                    jnp.uint32(255)).astype(jnp.int32).astype(jnp.float32)
                eq = jax.lax.slice(krow, (p * P, 0),
                                   ((p + 1) * P, 9 * cpb)) == tp
                jm = eq if jm is None else (jm & eq)     # [P, 9*cpb]
            # select the matched sub-position: expand jm to group lanes,
            # mask the gathered features, tree-sum the P sub-blocks (the
            # old 8-step where/slice chain serialized on the VPU).
            # NOTE: running this chain in bf16 (exact by one-hot
            # construction) was measured SLOWER on the v5e (stem 17.4 ->
            # 19.5 ms) — the f32->bf16 relayouts cost more than the halved
            # traffic saves. It stays f32.
            jmf = jnp.repeat(jm.astype(jnp.float32), group, axis=0)
            partM = partT * jmf                          # [128, 9*cpb]
            selT = partM.reshape(P, group, 9 * cpb).sum(axis=0)
            # per-tap weight dots on the lane-sliced selection
            for t, (mz, my, mx, delta, kidx) in enumerate(doffs):
                sel_t = jax.lax.slice(selT, (0, t * cpb),
                                      (group, (t + 1) * cpb))
                acc = acc + jax.lax.dot_general(
                    sel_t.astype(jnp.bfloat16), w_ref[kidx],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [cpb, cout_p]
            return acc

        acc = jnp.zeros((cpb, cout_p), jnp.float32)
        hw = H * W
        zs = (-1, 0, 1) if nz == 3 else (0,)
        for g, dz in enumerate(zs):
            doffs = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    doffs.append((dz * 102, dy * 100, dx * 101,
                                  dz * hw + dy * W + dx,
                                  (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)))
            sp0 = starts_ref[b, (blk * nz + g) * 2]
            ep = starts_ref[b, (blk * nz + g) * 2 + 1]
            off0 = pl.multiple_of(sp0, 8)
            nch = jnp.maximum(pl.cdiv(jnp.maximum(ep - off0, 0), WINP), 0)

            pltpu.make_async_copy(
                kpk_hbm.at[b, pl.ds(off0, WINP), :], kpk_vm.at[buf, g],
                sem_k.at[buf, g]).wait()
            pltpu.make_async_copy(
                fpk_hbm.at[b, pl.ds(off0, WINP), :], fpk_vm.at[buf, g],
                sem_f.at[buf, g]).wait()
            acc = zgroup(acc, kpk_vm[buf, g], fpk_vm[buf, g], doffs)

            def chunk(ci, acc, g=g, off0=off0, doffs=doffs):
                off = pl.multiple_of(off0 + ci * WINP, 8)
                ck = pltpu.make_async_copy(
                    kpk_hbm.at[b, pl.ds(off, WINP), :], kpk_vm.at[buf, g],
                    sem_k.at[buf, g])
                cf = pltpu.make_async_copy(
                    fpk_hbm.at[b, pl.ds(off, WINP), :], fpk_vm.at[buf, g],
                    sem_f.at[buf, g])
                ck.start()
                cf.start()
                ck.wait()
                cf.wait()
                return zgroup(acc, kpk_vm[buf, g], fpk_vm[buf, g], doffs)

            acc = jax.lax.fori_loop(1, nch, chunk, acc)
        if has_shift:
            # epilogue shift on valid rows only (padding rows must stay
            # zero — see the unpacked kernel). vm lives in LANES here; a
            # one-hot dot transposes the validity vector into SUBLANES.
            vmf = (vm_l != 0).astype(jnp.float32)       # [1, cpb] lanes
            sub = jax.lax.broadcasted_iota(jnp.int32, (cpb, cpb), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (cpb, cpb), 1)
            # f32 operands: Mosaic mis-verifies a bf16 one-hot dot here
            # (vector.broadcast bf16->f32); 0/1 values are exact either way
            eye = (sub == lane).astype(jnp.float32)
            valid = jax.lax.dot_general(
                eye, vmf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [cpb, 1]
            acc = valid * (acc + aff_ref[0, :][None, :])
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("D", "H", "W", "kernel_size", "interpret", "impl",
                     "cpb", "relu", "out_dtype"))
def sparse_conv3d_win(qbase, in_keys, in_feats, weights, D, H, W,
                      kernel_size: int = 3, interpret: bool = False,
                      impl: str = None, cpb: int = None,
                      scale=None, shift=None, relu: bool = False,
                      out_dtype=None):
    """qbase [B, Vq] int32 input-space target keys, SORTED ascending per
    row (sentinel >= D*H*W for padding rows); in_keys [B, Vin] sorted
    active keys (sentinel-padded); in_feats [B, Vin, Cin] (zero padding);
    weights [K^3 * Cin, Cout] -> out [B, Vq, Cout].

    `impl` overrides dispatch for A/B benching: 'packed' (cin <= 64 only)
    or 'unpacked'; None picks packed when cin <= 32.

    Fused eval-BN epilogue (saves the f32 HBM round trip per conv):
    `scale`/`shift` [Cout] apply y = conv(x) * scale + shift in-kernel
    (scale is folded into the weights; shift lands only on valid rows so
    padded feature rows stay exactly zero — the sentinel self-match
    invariant downstream kernels rely on), then optional `relu`.
    `out_dtype` (e.g. bf16) halves the output write traffic; accumulation
    stays f32 either way."""
    assert kernel_size in (1, 3)
    b, vq = qbase.shape
    vin = in_keys.shape[1]
    cin = in_feats.shape[-1]
    cout = weights.shape[-1]
    k3 = kernel_size ** 3
    assert weights.shape[0] == k3 * cin
    if scale is not None:
        weights = weights * scale[None, :]
    out_dtype = out_dtype or jnp.float32
    # packed wins at cin<=32 (v5e stage sweep: stem 28.4->18.8 ms, down2
    # 26.1->13.2, blk2 15.4->12.6, down3 13.8->9.8); at cin=64 P=2 makes
    # it a wash (blk3 9.0 vs 9.0), so dispatch keeps the unpacked kernel
    if (cin <= 32 and impl != "unpacked") or impl == "packed":
        return _sparse_conv3d_packed(qbase, in_keys, in_feats, weights,
                                     D, H, W, kernel_size, interpret,
                                     cpb=cpb, shift=shift, relu=relu,
                                     out_dtype=out_dtype)
    cin_p = _round_up(cin, _LANE)
    cout_p = _round_up(cout, _LANE)
    cpb = 256
    WIN = 512
    nb = -(-vq // cpb)
    hw_sentinel = np.int32(D * H * W + 7)

    # weights -> [27, cin_p, cout_p] (k=1 convs broadcast into the center)
    wk = weights.reshape(k3, cin, cout)
    if k3 == 1:
        full = jnp.zeros((27, cin, cout), wk.dtype)
        wk = full.at[13].set(wk[0])
    wk = jnp.pad(wk, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))

    # padding keys are sentinel + offset: STRICTLY INCREASING so a padding
    # block's window span stays O(block) — equal sentinels would make the
    # center-group span cover the whole sentinel tail
    pad_q = nb * cpb - vq
    qb_p = jnp.concatenate([
        qbase,
        jnp.broadcast_to(hw_sentinel + vq +
                         jnp.arange(pad_q, dtype=jnp.int32)[None],
                         (b, pad_q))
    ], axis=1) if pad_q else qbase
    # boundary bitmask per query voxel (the kernel cannot div/mod vectors
    # by arbitrary constants): bit set = that offset direction stays in
    # the grid. Padding rows get 0 (their sentinel self-match only ever
    # adds zero features).
    hw = H * W
    zq = qb_p // hw
    rem = qb_p - zq * hw
    yq = rem // W
    xq = rem - yq * W
    in_grid = qb_p < (D * hw)
    vmask = (jnp.where(in_grid & (xq > 0), 1, 0)
             | jnp.where(in_grid & (xq < W - 1), 2, 0)
             | jnp.where(in_grid & (yq > 0), 4, 0)
             | jnp.where(in_grid & (yq < H - 1), 8, 0)
             | jnp.where(in_grid & (zq > 0), 16, 0)
             | jnp.where(in_grid & (zq < D - 1), 32, 0)).astype(jnp.int32)
    # pack (qbase ++ vmask) so one DMA fetches both per block
    qbm = jnp.stack([qb_p, vmask], axis=1)           # [B, 2, nb*cpb]

    # chunk DMAs may start at floor128(e) with e at the padded length, so
    # the tail carries TWO windows of sentinel rows
    vin_p = _round_up(vin, _LANE) + 2 * WIN
    keys_p = jnp.concatenate([
        in_keys,
        jnp.broadcast_to(hw_sentinel + vin +
                         jnp.arange(vin_p - vin, dtype=jnp.int32)[None],
                         (b, vin_p - vin))
    ], axis=1)
    feats_p = jnp.pad(in_feats, ((0, 0), (0, vin_p - vin),
                                 (0, cin_p - cin)))

    # per-(block, z-group) sorted-row windows [start, end): block keys are
    # monotone, so neighbors of the whole block live in one span
    nz = 3 if kernel_size == 3 else 1
    lo_q = qb_p[:, ::cpb]                                # [B, nb]
    hi_q = jnp.concatenate(
        [qb_p[:, cpb - 1::cpb][:, :nb - 1], qb_p[:, -1:]], axis=1) \
        if nb > 1 else qb_p[:, -1:]
    dzs = jnp.asarray([-1, 0, 1] if nz == 3 else [0], jnp.int32)
    # neighbor margin: +-(W+1) covers the y/x taps of a 3^3 kernel; a 1^3
    # kernel has only the center tap (margin +-0)
    mgn = (W + 1) if kernel_size == 3 else 0
    lo_keys = lo_q[:, :, None] + dzs[None, None, :] * hw - mgn
    hi_keys = hi_q[:, :, None] + dzs[None, None, :] * hw + (mgn + 1)

    # clamp span ends so the last chunk DMA [floor128(e), +WIN) stays in
    # bounds: real rows end at vin, so capping at round_up(vin)+WIN keeps
    # every real neighbor while off+WIN <= vin_p always holds
    e_cap = np.int32(_round_up(vin, _LANE) + WIN)

    def spans(keys_row, lo_row, hi_row):
        s = jnp.searchsorted(keys_row, lo_row.reshape(-1)).astype(jnp.int32)
        e = jnp.searchsorted(keys_row, hi_row.reshape(-1)).astype(jnp.int32)
        e = jnp.minimum(e, e_cap)
        s = jnp.minimum(s, e)
        return s.reshape(nb, nz), e.reshape(nb, nz)
    s_all, e_all = jax.vmap(spans)(keys_p, lo_keys, hi_keys)
    # flat [B, nb*nz*2 (++ nb active flags)] — SMEM tiles pad the trailing
    # two dims to (8, 128), so a 4-D layout would blow the 1 MB scalar
    # memory. A block whose FIRST query key is already sentinel is all
    # padding (keys sorted): flag 0 skips its DMAs and compute entirely.
    spans_flat = jnp.stack([s_all, e_all], axis=-1).reshape(b, nb * nz * 2)
    act = (lo_q < hw_sentinel).astype(jnp.int32)         # [B, nb]
    starts = jnp.concatenate([spans_flat, act], axis=1)

    aff = jnp.zeros((8, cout_p), jnp.float32)
    if shift is not None:
        aff = aff.at[0, :cout].set(shift.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # qbase ++ vmask
            pl.BlockSpec(memory_space=pltpu.HBM),       # keys
            pl.BlockSpec(memory_space=pltpu.HBM),       # feats
            pl.BlockSpec(memory_space=pltpu.VMEM),      # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),      # affine shift
        ],
        out_specs=pl.BlockSpec(
            (1, cpb, cout_p), lambda bb, blk, starts: (bb, blk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, cpb), jnp.int32),          # qb ++ vmask
            pltpu.VMEM((2, nz, 1, WIN), jnp.int32),      # group keys
            pltpu.VMEM((2, nz, WIN, cin_p), feats_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, nz)),
            pltpu.SemaphoreType.DMA((2, nz)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, D, H, W, cpb, WIN, cin_p, cout_p, nz,
                          nb, relu),
        out_shape=jax.ShapeDtypeStruct((b, nb * cpb, cout_p), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(starts, qbm, keys_p[:, None, :], feats_p, wk, aff)
    return out[:, :vq, :cout]


def _sparse_conv3d_packed(qbase, in_keys, in_feats, weights, D, H, W,
                          kernel_size: int, interpret: bool,
                          cpb: int = None, shift=None, relu: bool = False,
                          out_dtype=jnp.float32):
    """Packed-lane variant for cin <= 64 (see _kernel_packed): P = 128/group
    voxels share one 128-lane feature row, cutting the one-hot match MACs
    by P (the C16/C32/C64 stages of SparseResNet3D — reference
    paddle3d/models/middle_encoders/sparse_resnet.py:115 — pad cin to the
    128-lane MXU width otherwise)."""
    b, vq = qbase.shape
    vin = in_keys.shape[1]
    cin = in_feats.shape[-1]
    cout = weights.shape[-1]
    k3 = kernel_size ** 3
    if cin > 64:
        raise ValueError(
            f"impl='packed' supports cin <= 64 (got cin={cin}); use the "
            "unpacked kernel for wider channels")
    group = 16 if cin <= 16 else (32 if cin <= 32 else 64)
    P = _LANE // group
    cout_p = _round_up(cout, _LANE)
    # bigger blocks + tight windows: fewer / wider MXU invocations (the
    # fixed per-invocation cost dominated at cpb=256), and the +16 slack
    # row budget is absorbed by the chunk loop when a block's span spills
    cpb = cpb or 512
    nb = -(-vq // cpb)
    ratio = max(1, -(-vin // max(vq, 1)))
    WINP = min(512, _round_up(cpb * ratio // P + 16, 8))
    hw_sentinel = np.int32(D * H * W + 7)
    hw = H * W

    # weights -> [27, group, cout_p]
    wk = weights.reshape(k3, cin, cout)
    if k3 == 1:
        full = jnp.zeros((27, cin, cout), wk.dtype)
        wk = full.at[13].set(wk[0])
    wk = jnp.pad(wk, ((0, 0), (0, group - cin), (0, cout_p - cout)))

    # query padding: strictly-increasing sentinels (see the unpacked path)
    pad_q = nb * cpb - vq
    qb_p = jnp.concatenate([
        qbase,
        jnp.broadcast_to(hw_sentinel + vq +
                         jnp.arange(pad_q, dtype=jnp.int32)[None],
                         (b, pad_q))
    ], axis=1) if pad_q else qbase
    zq = qb_p // hw
    rem = qb_p - zq * hw
    yq = rem // W
    xq = rem - yq * W
    in_grid = qb_p < (D * hw)
    vmask = (jnp.where(in_grid & (xq > 0), 1, 0)
             | jnp.where(in_grid & (xq < W - 1), 2, 0)
             | jnp.where(in_grid & (yq > 0), 4, 0)
             | jnp.where(in_grid & (yq < H - 1), 8, 0)
             | jnp.where(in_grid & (zq > 0), 16, 0)
             | jnp.where(in_grid & (zq < D - 1), 32, 0)).astype(jnp.int32)
    qbm = jnp.stack([qb_p, vmask], axis=1)            # [B, 2, nb*cpb] lanes

    # input padding + packing: 2 extra windows absorb slow-chunk overrun
    vin_p = _round_up(vin, _LANE) + 2 * WINP * P
    keys_p = jnp.concatenate([
        in_keys,
        jnp.broadcast_to(hw_sentinel + vin +
                         jnp.arange(vin_p - vin, dtype=jnp.int32)[None],
                         (b, vin_p - vin))
    ], axis=1)
    npk = vin_p // P
    # lane-pad packed keys to the full 128-lane tile: Mosaic rejects HBM
    # DMA slices whose lane extent (P) is not 128-aligned; pad lanes are
    # sliced off in-kernel and never read
    kpk = jnp.pad(keys_p.reshape(b, npk, P),
                  ((0, 0), (0, 0), (0, _LANE - P)))
    fpk = jnp.pad(in_feats, ((0, 0), (0, vin_p - vin),
                             (0, group - cin))).reshape(b, npk, _LANE)

    # per-(block, z-group) spans in PACKED rows; starts 8-aligned (sublane
    # DMA offsets), ends capped so off0 + nch*WINP stays inside npk
    nz = 3 if kernel_size == 3 else 1
    lo_q = qb_p[:, ::cpb]
    hi_q = jnp.concatenate(
        [qb_p[:, cpb - 1::cpb][:, :nb - 1], qb_p[:, -1:]], axis=1) \
        if nb > 1 else qb_p[:, -1:]
    dzs = jnp.asarray([-1, 0, 1] if nz == 3 else [0], jnp.int32)
    mgn = (W + 1) if kernel_size == 3 else 0
    lo_keys = lo_q[:, :, None] + dzs[None, None, :] * hw - mgn
    hi_keys = hi_q[:, :, None] + dzs[None, None, :] * hw + (mgn + 1)
    ep_cap = np.int32(_round_up(vin, _LANE) // P + WINP)

    def spans(keys_row, lo_row, hi_row):
        s = jnp.searchsorted(keys_row, lo_row.reshape(-1)).astype(jnp.int32)
        e = jnp.searchsorted(keys_row, hi_row.reshape(-1)).astype(jnp.int32)
        sp = (s // P) // 8 * 8
        epk = jnp.minimum(-(-e // P), ep_cap)
        sp = jnp.minimum(sp, epk)
        return sp.reshape(nb, nz), epk.reshape(nb, nz)
    s_all, e_all = jax.vmap(spans)(keys_p, lo_keys, hi_keys)
    spans_flat = jnp.stack([s_all, e_all], axis=-1).reshape(b, nb * nz * 2)
    act = (lo_q < hw_sentinel).astype(jnp.int32)
    starts = jnp.concatenate([spans_flat, act], axis=1)

    aff = jnp.zeros((8, cout_p), jnp.float32)
    if shift is not None:
        aff = aff.at[0, :cout].set(shift.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # qbm (lanes)
            pl.BlockSpec(memory_space=pltpu.HBM),       # packed keys
            pl.BlockSpec(memory_space=pltpu.HBM),       # packed feats
            pl.BlockSpec(memory_space=pltpu.VMEM),      # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),      # affine shift
        ],
        out_specs=pl.BlockSpec(
            (1, cpb, cout_p), lambda bb, blk, starts: (bb, blk, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, cpb), jnp.int32),          # qb ++ vmask lanes
            pltpu.VMEM((2, nz, WINP, _LANE), jnp.int32),  # packed keys
            pltpu.VMEM((2, nz, WINP, _LANE), fpk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, nz)),
            pltpu.SemaphoreType.DMA((2, nz)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_packed, H, W, cpb, WINP, P, group,
                          cout_p, nz, nb, relu, shift is not None),
        out_shape=jax.ShapeDtypeStruct((b, nb * cpb, cout_p), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(starts, qbm, kpk, fpk, wk, aff)
    return out[:, :vq, :cout]
