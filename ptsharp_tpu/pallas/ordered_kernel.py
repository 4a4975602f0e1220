"""Stack-ordered packet traversal: near-to-far descent for bounce rays.

The production packet kernels (pallas/wide_kernel.py) walk the tree in
PREORDER with skip links: each 128-lane group's cursor jumps to the
minimum preorder index any lane wants next. Preorder is a static spatial
order, so for rays travelling "against" it the far subtrees are visited
before the near ones, best-t shrinks late, and the `ctmin < bt` prune
fires rarely — the measured bounce-ray wall (BASELINE.md round-4 stage
table: 1.66 Mrays/s, ~60% of a mesh bounce step).

The reference's per-ray k-d descent is ORDERED: near child first with a
`h1.T <= tsplit` early-out (/root/reference/PTSharpCore/Tree.cs:67-113),
which is exactly why it visits ~30 nodes per ray. This kernel recovers
that property for packets:

  * each sublane group owns a traversal STACK carried as a (G, 128) i32
    vector register: push = lane-roll right + insert at lane 0, pop =
    read lane 0 + lane-roll left (sentinel `end` backfills). No SMEM, no
    dynamic indexing — pushes/pops are dense VPU lane shifts;
  * at an internal node the group slab-tests the K children, reduces a
    per-child scalar key = min over lanes of the masked entry distance,
    and pushes the hit children in DECREASING key order (selection sort
    in (G, 1) vector ops), so the pop order is globally near-to-far for
    the packet consensus;
  * every iteration ends with a pop; popped nodes re-test their own box
    against the CURRENT per-lane best-t, so subtrees that became
    irrelevant after a nearer hit landed cost one cheap pruned iteration
    instead of a full walk.

Same tables, same results as pallas_traverse_wide8 (Tree.cs:67-128 +
Triangle.cs:95-124 semantics); only the visit order — and therefore the
visit COUNT — differs.

Stack capacity is 128 entries/group; a push beyond that silently drops
the DEEPEST entry, so callers must check `max_stack_bound` (= (K-1) *
wide-tree depth) at pack time. Bunny (82k tris) bounds at ~35, dragon
(1.3M) at ~60.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptsharp_tpu.core import vec
from ptsharp_tpu.pallas import wide_kernel as wk

BIG = np.int32(2**31 - 1)


def max_stack_bound(rows: np.ndarray, k: int, base: int = 0,
                    end: int | None = None) -> int:
    """Worst-case stack entries for an ordered walk of wide rows
    [base, end): (K-1) pushes per level x tree depth, computed exactly by
    a host DFS over the packed child indices."""
    rows = np.asarray(rows)
    if end is None:
        end = rows.shape[0]
    if end <= base:
        return 0
    bits = rows[:, :].view(np.int32)
    cnt = bits[:, 7] & 0xFF
    depth = np.zeros(end - base, np.int32)
    best = 0
    stack = [(base, 0)]
    cidx_cols = [9 + 6 * k + c for c in range(k)]
    while stack:
        n, d = stack.pop()
        best = max(best, d)
        if cnt[n] > 0:
            continue
        for col in cidx_cols:
            c = bits[n, col]
            if c > 0:
                stack.append((int(c), d + 1))
    return (k - 1) * best + 1


def _kernel8_ord(rows_ref, leaf_ref, org_ref, dir_ref, tmax_ref,
                 *refs, base, end, leaf_size, k, max_iters, order_mode,
                 with_iters, defer_leaf=False, desc_gate=False):
    if with_iters:
        t_ref, slot_ref, u_ref, v_ref, it_ref, nscr, lscr = refs
    else:
        t_ref, slot_ref, u_ref, v_ref, nscr, lscr = refs
        it_ref = None
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)
    sentinel = jnp.int32(end)

    def flush_pending(prow, pfirst, pmask, args):
        """One MT pass over every group's pending leaf (defer_leaf mode)."""
        for g in range(G):
            lj = jnp.maximum(prow[g, 0], 0)
            lscr[g, :] = leaf_ref[jnp.minimum(lj, leaf_ref.shape[0] - 1)]
        mask = (pmask != 0) & (prow >= 0)
        return wk.packet_mt(lscr[:], leaf_size, mask, o3, d3, pfirst,
                            args, wk.accept_closest)

    def cond(s):
        cur = s[0]
        it = s[2]
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        if defer_leaf:
            cur, stk, it, bt, bs, bu, bv, prow, pfirst, pmask = s
        else:
            cur, stk, it, bt, bs, bu, bv = s   # cur (G,1) i32, stk (G,L)
        active = cur < end
        for g in range(G):
            j = jnp.minimum(cur[g, 0], end - 1)
            nscr[g, :] = rows_ref[j]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active

        leaf_ok = box_hit & is_leaf

        if defer_leaf:
            # batch leaves: flush only when a group that already HOLDS a
            # pending leaf reaches another one. With 8 independent groups
            # an any-group-at-leaf cond fires ~every iteration; batching
            # cuts MT passes ~Gx at the cost of later best-t shrink
            # (visits only grow — results identical, best-t semantics
            # are order-independent).
            at_leaf = jnp.any(leaf_ok, axis=1, keepdims=True)  # (G,1)
            need_flush = jnp.any(at_leaf & (prow >= 0))

            def do_flush(args):
                return flush_pending(prow, pfirst, pmask, args)

            bt, bs, bu, bv = jax.lax.cond(
                need_flush, do_flush, lambda a: a, (bt, bs, bu, bv))
            prow_aft = jnp.where(need_flush, -1, prow)
            pmask_aft = jnp.where(need_flush, 0, pmask)
            lrow = jnp.where(is_leaf, first // leaf_size, 0)
            prow = jnp.where(at_leaf, lrow, prow_aft)
            pfirst = jnp.where(at_leaf, first, pfirst)
            pmask = jnp.where(jnp.broadcast_to(at_leaf, (G, L)),
                              leaf_ok.astype(jnp.int32), pmask_aft)
        else:
            any_leaf = jnp.any(leaf_ok)

            def do_leaf(args):
                for g in range(G):
                    lj = jnp.where((bits[g, 7] & 0xFF) > 0,
                                   bits[g, 6] // leaf_size, 0)
                    lscr[g, :] = leaf_ref[
                        jnp.minimum(lj, leaf_ref.shape[0] - 1)]
                return wk.packet_mt(lscr[:], leaf_size, leaf_ok, o3, d3,
                                    first, args, wk.accept_closest)

            bt, bs, bu, bv = jax.lax.cond(any_leaf, do_leaf, lambda a: a,
                                          (bt, bs, bu, bv))

        # --- per-child group keys: min over lanes of masked entry dist ----
        vote = box_hit & jnp.logical_not(is_leaf)   # lanes that may descend

        def descend_full(stk):
            kc = []     # (G, 1) f32 per child
            ca = []     # (G, 1) bool per child (any lane hit)
            cidx = []   # (G, 1) i32 per child
            for c in range(k):
                cb = 9 + 6 * c
                ctmin, ctmax = wk.packet_slab(nrow, cb, cb + 3, o3, i3)
                ci = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
                chit = (
                    (ctmax >= jnp.maximum(ctmin, 0.0))
                    & (ctmin < bt) & vote & (ci > 0)
                )
                kk = jnp.min(jnp.where(chit, ctmin, vec.INF), axis=1,
                             keepdims=True)
                kc.append(kk)
                ca.append(kk < vec.INF)
                cidx.append(ci)

            def push(stk, do, val):
                rolled = pltpu.roll(stk, 1, 1)
                inserted = jnp.where(lane == 0, val, rolled)
                return jnp.where(do, inserted, stk)

            # nearest hit child becomes cur DIRECTLY (no push+pop trip)
            bk = jnp.full((G, 1), vec.INF, jnp.float32)
            bnear = jnp.full((G, 1), -1, jnp.int32)
            bnearv = jnp.zeros((G, 1), jnp.int32)
            for c in range(k):
                better = ca[c] & (kc[c] < bk)
                bk = jnp.where(better, kc[c], bk)
                bnear = jnp.where(better, c, bnear)
                bnearv = jnp.where(better, cidx[c], bnearv)

            if order_mode == "full":
                # remaining hit children selection-sorted: FARTHEST
                # pushed first, so pops come off near-to-far
                rem = [ca[c] & (bnear != c) for c in range(k)]
                for _ in range(k - 1):
                    pk = jnp.full((G, 1), -vec.INF, jnp.float32)
                    pi = jnp.full((G, 1), -1, jnp.int32)
                    pv = jnp.zeros((G, 1), jnp.int32)
                    for c in range(k):
                        better = rem[c] & (kc[c] >= pk)
                        pk = jnp.where(better, kc[c], pk)
                        pi = jnp.where(better, c, pi)
                        pv = jnp.where(better, cidx[c], pv)
                    for c in range(k):
                        rem[c] = rem[c] & (pi != c)
                    stk = push(stk, pi >= 0, pv)
            else:
                # "near": remaining hit children pushed in static reverse
                for c in range(k - 1, -1, -1):
                    stk = push(stk, ca[c] & (bnear != c), cidx[c])

            # descend to the nearest child, else pop the stack
            nxt_ok = bnear >= 0
            top = stk[:, 0:1]
            # roll by L-1 == roll by -1 (pltpu.roll needs shift >= 0)
            popped = jnp.where(lane == L - 1, sentinel,
                               pltpu.roll(stk, L - 1, 1))
            stk = jnp.where(active & jnp.logical_not(nxt_ok), popped, stk)
            new_cur = jnp.where(active, jnp.where(nxt_ok, bnearv, top),
                                cur)
            return stk, new_cur

        def descend_pop(stk):
            # no group can descend: every active group pops
            top = stk[:, 0:1]
            popped = jnp.where(lane == L - 1, sentinel,
                               pltpu.roll(stk, L - 1, 1))
            stk = jnp.where(active, popped, stk)
            new_cur = jnp.where(active, top, cur)
            return stk, new_cur

        if desc_gate:
            stk, cur = jax.lax.cond(jnp.any(vote), descend_full,
                                    descend_pop, stk)
        else:
            stk, cur = descend_full(stk)
        if defer_leaf:
            return (cur, stk, it + 1, bt, bs, bu, bv, prow, pfirst, pmask)
        return cur, stk, it + 1, bt, bs, bu, bv

    t0 = tmax_ref[0, :].reshape(G, L)
    init = (
        jnp.full((G, 1), base, jnp.int32),
        jnp.full((G, L), end, jnp.int32),
        jnp.int32(0), t0,
        jnp.full((G, L), -1, jnp.int32),
        jnp.zeros((G, L), jnp.float32),
        jnp.zeros((G, L), jnp.float32),
    )
    if defer_leaf:
        init = init + (
            jnp.full((G, 1), -1, jnp.int32),   # pending leaf row
            jnp.zeros((G, 1), jnp.int32),      # pending first slot
            jnp.zeros((G, L), jnp.int32),      # pending lane mask
        )
        out = jax.lax.while_loop(cond, body, init)
        _, _, it, bt, bs, bu, bv, prow, pfirst, pmask = out
        # drain the last pending leaves
        bt, bs, bu, bv = jax.lax.cond(
            jnp.any(prow >= 0),
            lambda a: flush_pending(prow, pfirst, pmask, a),
            lambda a: a, (bt, bs, bu, bv))
    else:
        _, _, it, bt, bs, bu, bv = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = jnp.where(bs >= 0, bt, vec.INF).reshape(G * L)
    slot_ref[0, :] = bs.reshape(G * L)
    u_ref[0, :] = bu.reshape(G * L)
    v_ref[0, :] = bv.reshape(G * L)
    if it_ref is not None:
        it_ref[0, :] = jnp.broadcast_to(it, (G * L,))


def _kernel8_ord_any(rows_ref, leaf_ref, org_ref, dir_ref, tcut_ref,
                     occ_ref, nscr, lscr,
                     *, base, end, leaf_size, k, max_iters, order_mode):
    """Any-hit ordered-stack kernel: boolean occlusion with lane
    retirement + packet early-exit (wide_kernel._kernel8_any semantics,
    near-to-far visit order so occluders are found sooner)."""
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)
    sentinel = jnp.int32(end)
    t0 = tcut_ref[0, :].reshape(G, L)
    inact = (t0 <= 0.0).astype(jnp.int32)

    def cond(s):
        cur, stk, it, occ = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, stk, it, occ = s
        active = cur < end
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)
        for g in range(G):
            j = jnp.minimum(cur[g, 0], end - 1)
            nscr[g, :] = rows_ref[j]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf
        any_leaf = jnp.any(leaf_ok)

        def accept_any(occ_in, ok, tt, _slot, _uu, _vv):
            return jnp.maximum(occ_in, (ok & (tt < bt)).astype(jnp.int32))

        def do_leaf(occ_in):
            for g in range(G):
                lj = jnp.where((bits[g, 7] & 0xFF) > 0,
                               bits[g, 6] // leaf_size, 0)
                lscr[g, :] = leaf_ref[jnp.minimum(lj, leaf_ref.shape[0] - 1)]
            return wk.packet_mt(lscr[:], leaf_size, leaf_ok, o3, d3, first,
                                occ_in, accept_any)

        occ = jax.lax.cond(any_leaf, do_leaf, lambda o: o, occ)
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)

        vote = box_hit & jnp.logical_not(is_leaf) & jnp.logical_not(occ_b)
        kc, ca, cidx = [], [], []
        for c in range(k):
            cb = 9 + 6 * c
            ctmin, ctmax = wk.packet_slab(nrow, cb, cb + 3, o3, i3)
            ci = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
            chit = (
                (ctmax >= jnp.maximum(ctmin, 0.0))
                & (ctmin < bt) & vote & (ci > 0)
            )
            kk = jnp.min(jnp.where(chit, ctmin, vec.INF), axis=1,
                         keepdims=True)
            kc.append(kk)
            ca.append(kk < vec.INF)
            cidx.append(ci)

        def push(stk, do, val):
            rolled = pltpu.roll(stk, 1, 1)
            inserted = jnp.where(lane == 0, val, rolled)
            return jnp.where(do, inserted, stk)

        bk = jnp.full((G, 1), vec.INF, jnp.float32)
        bnear = jnp.full((G, 1), -1, jnp.int32)
        bnearv = jnp.zeros((G, 1), jnp.int32)
        for c in range(k):
            better = ca[c] & (kc[c] < bk)
            bk = jnp.where(better, kc[c], bk)
            bnear = jnp.where(better, c, bnear)
            bnearv = jnp.where(better, cidx[c], bnearv)
        if order_mode == "full":
            rem = [ca[c] & (bnear != c) for c in range(k)]
            for _ in range(k - 1):
                pk = jnp.full((G, 1), -vec.INF, jnp.float32)
                pi = jnp.full((G, 1), -1, jnp.int32)
                pv = jnp.zeros((G, 1), jnp.int32)
                for c in range(k):
                    better = rem[c] & (kc[c] >= pk)
                    pk = jnp.where(better, kc[c], pk)
                    pi = jnp.where(better, c, pi)
                    pv = jnp.where(better, cidx[c], pv)
                for c in range(k):
                    rem[c] = rem[c] & (pi != c)
                stk = push(stk, pi >= 0, pv)
        else:
            for c in range(k - 1, -1, -1):
                stk = push(stk, ca[c] & (bnear != c), cidx[c])

        nxt_ok = bnear >= 0
        top = stk[:, 0:1]
        popped = jnp.where(lane == L - 1, sentinel, pltpu.roll(stk, L - 1, 1))
        stk = jnp.where(active & jnp.logical_not(nxt_ok), popped, stk)
        nxt = jnp.where(nxt_ok, bnearv, top)
        # packet-wide early exit: every lane occluded OR inactive -> done
        all_done = jnp.min(jnp.maximum(occ, inact), axis=1,
                           keepdims=True) > 0
        nxt = jnp.where(all_done, end, nxt)
        cur = jnp.where(active, nxt, cur)
        return cur, stk, it + 1, occ

    init = (
        jnp.full((G, 1), base, jnp.int32),
        jnp.full((G, L), end, jnp.int32),
        jnp.int32(0),
        jnp.zeros((G, L), jnp.int32),
    )
    _, _, _, occ = jax.lax.while_loop(cond, body, init)
    occ_ref[0, :] = occ.reshape(G * L)


def _kernel8_ord_fat(fat_ref, org_ref, dir_ref, tmax_ref,
                     t_ref, slot_ref, u_ref, v_ref, fscr, nscr, lscr, nsem,
                     *, base, end, leaf_size, k, max_iters, order_mode,
                     pipelined, mt_gate=False, desc_gate=False):
    """Ordered-stack traversal over a pack_fat HBM table: one (2, 128)
    DMA per group per iteration (the proven single-cluster discipline,
    hbm_kernel module docstring) delivering node row + leaf block.

    pipelined=True: the NEXT iteration's DMA starts BEFORE this
    iteration's Möller–Trumbore unroll, so the fetch latency hides behind
    the leaf compute. The descent then selects children with the
    PRE-leaf best-t (stale by one leaf update) — visits only grow, never
    drop, so results are identical; the trade is a few extra pruned
    iterations against ~400 ops of DMA shadow per step."""
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)
    sentinel = jnp.int32(end)

    def start_fetch(cur):
        j = jnp.minimum(cur, end - 1)
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * j[g, 0], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).start()

    def wait_fetch(cur):
        j = jnp.minimum(cur, end - 1)
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * j[g, 0], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).wait()

    def cond(s):
        cur, stk, it, bt, bs, bu, bv = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, stk, it, bt, bs, bu, bv = s
        active = cur < end
        if pipelined:
            # the DMA for `cur` was started by the previous iteration
            wait_fetch(cur)
        else:
            start_fetch(cur)
            wait_fetch(cur)
        for g in range(G):
            nscr[g, :] = fscr[2 * g]
            lscr[g, :] = fscr[2 * g + 1]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        def descend_phase(stk, bt):
            vote = box_hit & jnp.logical_not(is_leaf)

            def full(stk):
                kc, ca, cidx = [], [], []
                for c in range(k):
                    cb = 9 + 6 * c
                    ctmin, ctmax = wk.packet_slab(nrow, cb, cb + 3, o3, i3)
                    ci = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
                    chit = (
                        (ctmax >= jnp.maximum(ctmin, 0.0))
                        & (ctmin < bt) & vote & (ci > 0)
                    )
                    kk = jnp.min(jnp.where(chit, ctmin, vec.INF), axis=1,
                                 keepdims=True)
                    kc.append(kk)
                    ca.append(kk < vec.INF)
                    cidx.append(ci)

                def push(stk, do, val):
                    rolled = pltpu.roll(stk, 1, 1)
                    inserted = jnp.where(lane == 0, val, rolled)
                    return jnp.where(do, inserted, stk)

                bk = jnp.full((G, 1), vec.INF, jnp.float32)
                bnear = jnp.full((G, 1), -1, jnp.int32)
                bnearv = jnp.zeros((G, 1), jnp.int32)
                for c in range(k):
                    better = ca[c] & (kc[c] < bk)
                    bk = jnp.where(better, kc[c], bk)
                    bnear = jnp.where(better, c, bnear)
                    bnearv = jnp.where(better, cidx[c], bnearv)
                if order_mode == "full":
                    rem = [ca[c] & (bnear != c) for c in range(k)]
                    for _ in range(k - 1):
                        pk = jnp.full((G, 1), -vec.INF, jnp.float32)
                        pi = jnp.full((G, 1), -1, jnp.int32)
                        pv = jnp.zeros((G, 1), jnp.int32)
                        for c in range(k):
                            better = rem[c] & (kc[c] >= pk)
                            pk = jnp.where(better, kc[c], pk)
                            pi = jnp.where(better, c, pi)
                            pv = jnp.where(better, cidx[c], pv)
                        for c in range(k):
                            rem[c] = rem[c] & (pi != c)
                        stk = push(stk, pi >= 0, pv)
                else:
                    for c in range(k - 1, -1, -1):
                        stk = push(stk, ca[c] & (bnear != c), cidx[c])

                nxt_ok = bnear >= 0
                top = stk[:, 0:1]
                popped = jnp.where(lane == L - 1, sentinel,
                                   pltpu.roll(stk, L - 1, 1))
                stk = jnp.where(active & jnp.logical_not(nxt_ok), popped,
                                stk)
                new_cur = jnp.where(active,
                                    jnp.where(nxt_ok, bnearv, top), cur)
                return stk, new_cur

            def pop_only(stk):
                # no group can descend: every active group pops
                top = stk[:, 0:1]
                popped = jnp.where(lane == L - 1, sentinel,
                                   pltpu.roll(stk, L - 1, 1))
                stk = jnp.where(active, popped, stk)
                new_cur = jnp.where(active, top, cur)
                return stk, new_cur

            if desc_gate:
                # skip the k child slabs + ordering when NO group can
                # descend (leaf/miss-only iterations — common bursts on
                # coherent rays, the defer-leaf finding)
                return jax.lax.cond(jnp.any(vote), full, pop_only, stk)
            return full(stk)

        if pipelined:
            # descend with the pre-leaf bt, start the next DMA, THEN run
            # the leaf unroll in the fetch shadow
            stk, new_cur = descend_phase(stk, bt)
            start_fetch(new_cur)
            if mt_gate:
                # skip the whole MT unroll (the dominant per-iteration
                # cost) on iterations where NO group sits at a leaf —
                # one scalar branch, none of defer-leaf's pend state
                lrow = lscr[:]
                bt, bs, bu, bv = jax.lax.cond(
                    jnp.any(leaf_ok),
                    lambda args: wk.packet_mt(
                        lrow, leaf_size, leaf_ok, o3, d3, first,
                        args, wk.accept_closest),
                    lambda args: args,
                    (bt, bs, bu, bv))
            else:
                bt, bs, bu, bv = wk.packet_mt(
                    lscr[:], leaf_size, leaf_ok, o3, d3, first,
                    (bt, bs, bu, bv), wk.accept_closest)
        else:
            bt, bs, bu, bv = wk.packet_mt(
                lscr[:], leaf_size, leaf_ok, o3, d3, first,
                (bt, bs, bu, bv), wk.accept_closest)
            stk, new_cur = descend_phase(stk, bt)
        return new_cur, stk, it + 1, bt, bs, bu, bv

    t0 = tmax_ref[0, :].reshape(G, L)
    cur0 = jnp.full((G, 1), base, jnp.int32)
    if pipelined:
        start_fetch(cur0)
    init = (
        cur0,
        jnp.full((G, L), end, jnp.int32),
        jnp.int32(0), t0,
        jnp.full((G, L), -1, jnp.int32),
        jnp.zeros((G, L), jnp.float32),
        jnp.zeros((G, L), jnp.float32),
    )
    cur, _, _, bt, bs, bu, bv = jax.lax.while_loop(cond, body, init)
    if pipelined:
        # drain the in-flight DMA so the grid step ends clean
        wait_fetch(cur)
    t_ref[0, :] = jnp.where(bs >= 0, bt, vec.INF).reshape(G * L)
    slot_ref[0, :] = bs.reshape(G * L)
    u_ref[0, :] = bu.reshape(G * L)
    v_ref[0, :] = bv.reshape(G * L)


def pallas_traverse_ordered8_fat(fat, org, dirn, t_max, base: int, end: int,
                                 leaf_size: int, k: int,
                                 max_iters: int | None = None,
                                 interpret: bool | None = None,
                                 order_mode: str = "near",
                                 pipelined: bool = True,
                                 mt_gate: bool = False,
                                 desc_gate: bool = False):
    """Closest-hit over a pack_fat table with ordered-stack traversal.
    Same contract as hbm_kernel.pallas_traverse_hbm8_fat. mt_gate skips
    the MT unroll on no-group-at-leaf iterations (pipelined mode only);
    desc_gate skips the child slabs on no-group-can-descend iterations."""
    if max_iters is None:
        max_iters = int(end) - int(base) + 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = 1024
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tm = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tm = jnp.concatenate([tm, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tm2 = tm.reshape(1, rp)
    kern = functools.partial(
        _kernel8_ord_fat, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        order_mode=order_mode, pipelined=bool(pipelined),
        mt_gate=bool(mt_gate), desc_gate=bool(desc_gate),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.int32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
    )
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    t, slot, u, v = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),   # fat pair per group
            pltpu.VMEM((8, 128), jnp.float32),    # node rows
            pltpu.VMEM((8, 128), jnp.float32),    # leaf rows
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(fat, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


def _kernel8_fat_any_pipe(fat_ref, org_ref, dir_ref, tcut_ref,
                          occ_ref, fscr, nscr, lscr, nsem,
                          *, base, end, leaf_size, k, max_iters,
                          mt_gate=False):
    """Any-hit fat-row kernel with software-pipelined DMA: the next
    iteration's one-cluster fetch starts before the MT unroll (descent
    and the packet-wide early exit use the PRE-leaf occlusion state —
    stale by one update, so exits lag one iteration; results identical).
    Preorder skip-walk traversal (any-hit gains nothing from ordering —
    measured tie on VMEM tables — but everything from latency hiding at
    HBM scale)."""
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)
    t0 = tcut_ref[0, :].reshape(G, L)
    inact = (t0 <= 0.0).astype(jnp.int32)

    def start_fetch(cur):
        j = jnp.minimum(cur, end - 1)
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * j[g, 0], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).start()

    def wait_fetch(cur):
        j = jnp.minimum(cur, end - 1)
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * j[g, 0], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).wait()

    def cond(s):
        cur, it, occ = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, occ = s
        active = cur < end
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)
        wait_fetch(cur)
        for g in range(G):
            nscr[g, :] = fscr[2 * g]
            lscr[g, :] = fscr[2 * g + 1]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        # descend + early-exit with the PRE-leaf occlusion state, then
        # start the next fetch and run the MT unroll in its shadow
        target = wk.packet_descend(nrow, bits, k, o3, i3, bt)
        descend = box_hit & jnp.logical_not(is_leaf) & jnp.logical_not(occ_b)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
        all_done = jnp.min(jnp.maximum(occ, inact), axis=1,
                           keepdims=True) > 0
        nxt = jnp.where(all_done, end, nxt)
        new_cur = jnp.where(active, nxt, cur)
        start_fetch(new_cur)

        def accept_any(occ_in, ok, tt, _slot, _uu, _vv):
            return jnp.maximum(occ_in, (ok & (tt < bt)).astype(jnp.int32))

        if mt_gate:
            lrow = lscr[:]
            occ = jax.lax.cond(
                jnp.any(leaf_ok),
                lambda o: wk.packet_mt(lrow, leaf_size, leaf_ok, o3, d3,
                                       first, o, accept_any),
                lambda o: o, occ)
        else:
            occ = wk.packet_mt(lscr[:], leaf_size, leaf_ok, o3, d3, first,
                               occ, accept_any)
        return new_cur, it + 1, occ

    cur0 = jnp.full((G, 1), base, jnp.int32)
    start_fetch(cur0)
    init = (cur0, jnp.int32(0), jnp.zeros((G, L), jnp.int32))
    cur, _, occ = jax.lax.while_loop(cond, body, init)
    wait_fetch(cur)  # drain the in-flight DMA
    occ_ref[0, :] = occ.reshape(G * L)


def pallas_occluded_fat_pipe(fat, org, dirn, t_cut, base: int, end: int,
                             leaf_size: int, k: int,
                             max_iters: int | None = None,
                             interpret: bool | None = None,
                             mt_gate: bool = False):
    """Any-hit query over a pack_fat table with pipelined DMA. Same
    contract as hbm_kernel.pallas_occluded_hbm8_fat. mt_gate skips the
    MT unroll on no-group-at-leaf iterations."""
    if max_iters is None:
        max_iters = int(end) - int(base) + 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = 1024
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tc = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_cut, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tc = jnp.concatenate([tc, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tc2 = tc.reshape(1, rp)
    kern = functools.partial(
        _kernel8_fat_any_pipe, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        mt_gate=bool(mt_gate),
    )
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((1, rp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(fat, org_t, dir_t, tc2)
    return occ[0, :r] != 0


def pallas_occluded_ordered8(rows, leaf, org, dirn, t_cut,
                             base: int, end: int,
                             leaf_size: int, k: int,
                             max_iters: int | None = None,
                             interpret: bool | None = None,
                             order_mode: str = "full"):
    """Any-hit query over [base, end) wide rows with ordered-stack
    traversal. Same contract as wide_kernel.pallas_occluded_wide8."""
    if max_iters is None:
        max_iters = int(end) - int(base) + 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = 1024
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tc = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_cut, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tc = jnp.concatenate([tc, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tc2 = tc.reshape(1, rp)
    kern = functools.partial(
        _kernel8_ord_any, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        order_mode=order_mode,
    )
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((1, rp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows, leaf, org_t, dir_t, tc2)
    return occ[0, :r] != 0


def pallas_traverse_ordered8(rows, leaf, org, dirn, t_max,
                             base: int, end: int,
                             leaf_size: int, k: int,
                             max_iters: int | None = None,
                             interpret: bool | None = None,
                             order_mode: str = "full",
                             return_iters: bool = False,
                             defer_leaf: bool = False,
                             desc_gate: bool = False):
    """Closest-hit over [base, end) wide rows with near-to-far ordered
    stack traversal. Same contract (tables, results, slot space) as
    pallas_traverse_wide8. order_mode: "full" = selection-sorted push
    order, "near" = nearest-first + static-order push (cheaper per
    iteration, weaker ordering). defer_leaf batches pending leaves
    across groups so the MT unroll fires per collision instead of per
    any-group-at-leaf iteration (identical results). desc_gate skips
    the child slabs on iterations where no group can descend."""
    if max_iters is None:
        max_iters = int(end) - int(base) + 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = 1024
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tm = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tm = jnp.concatenate([tm, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tm2 = tm.reshape(1, rp)

    kern = functools.partial(
        _kernel8_ord, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        order_mode=order_mode, with_iters=bool(return_iters),
        defer_leaf=bool(defer_leaf), desc_gate=bool(desc_gate),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.int32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
    ]
    if return_iters:
        out_shapes.append(jax.ShapeDtypeStruct((1, rp), jnp.int32))
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # node rows (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # leaf rows (full)
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec,) * len(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        # the default 16 MB scoped-vmem ceiling rejects bunny-scale tables
        # with this kernel's extra stack/ordering temporaries; v5e has
        # 128 MB of VMEM — raise the cap and let real hardware limits bind
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows, leaf, org_t, dir_t, tm2)
    return tuple(o[0, :r] for o in outs)


def _kernel8_ord_fat_dual(fat_ref, org_ref, dir_ref, tmax_ref,
                          t_ref, slot_ref, u_ref, v_ref,
                          fscr, nscr, lscr, nsem,
                          *, base, end, leaf_size, k, max_iters,
                          mt_gate=False):
    """DUAL-PACKET software-pipelined ordered fat kernel: two independent
    (8, 128) packets interleaved in one program. The single-packet
    pipelined kernel (_kernel8_ord_fat) hides each fat-row DMA behind
    only its own Möller–Trumbore unroll (~500 VPU ops); at HBM latency
    that shadow is too short, and the wait at the top of each iteration
    still stalls. Here packet A's in-flight DMA is shadowed by A's MT
    unroll PLUS packet B's entire phase (slab + descent + MT) and vice
    versa — ~3x the latency budget per fetch, same single-DMA-cluster-
    per-packet discipline (each packet owns its own 8 semaphores and
    fat-pair scratch rows, so the two clusters never share a semaphore
    or destination — the round-4 desync bisection condemned two clusters
    racing the SAME buffers, hbm_kernel.py module docstring).

    Traversal semantics per packet are identical to _kernel8_ord_fat
    (near-to-far ordered stack, pre-leaf best-t descent)."""
    G, L = 8, 128
    o3s = [tuple(org_ref[a, s * L * G:(s + 1) * L * G].reshape(G, L)
                 for a in range(3)) for s in range(2)]
    d3s = [tuple(dir_ref[a, s * L * G:(s + 1) * L * G].reshape(G, L)
                 for a in range(3)) for s in range(2)]
    i3s = [tuple(wk.packet_safe_inv(d) for d in d3s[s]) for s in range(2)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)
    sentinel = jnp.int32(end)

    def start_fetch(s, cur):
        j = jnp.minimum(cur, end - 1)
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * j[g, 0], 2)],
                fscr.at[pl.ds(2 * (s * G + g), 2)],
                nsem.at[s * G + g]).start()

    def wait_fetch(s, cur):
        j = jnp.minimum(cur, end - 1)
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * j[g, 0], 2)],
                fscr.at[pl.ds(2 * (s * G + g), 2)],
                nsem.at[s * G + g]).wait()

    def phase(s, cur, stk, bt, bs, bu, bv):
        """One traversal step for packet s; its next DMA is issued before
        the MT unroll so the OTHER packet's phase runs in its shadow."""
        o3, d3, i3 = o3s[s], d3s[s], i3s[s]
        active = cur < end
        wait_fetch(s, cur)
        for g in range(G):
            nscr[g, :] = fscr[2 * (s * G + g)]
            lscr[g, :] = fscr[2 * (s * G + g) + 1]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        # descent with the pre-leaf best-t (visits only grow; results
        # identical — _kernel8_ord_fat pipelined-mode argument)
        vote = box_hit & jnp.logical_not(is_leaf)
        kc, ca, cidx = [], [], []
        for c in range(k):
            cb = 9 + 6 * c
            ctmin, ctmax = wk.packet_slab(nrow, cb, cb + 3, o3, i3)
            ci = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
            chit = (
                (ctmax >= jnp.maximum(ctmin, 0.0))
                & (ctmin < bt) & vote & (ci > 0)
            )
            kk = jnp.min(jnp.where(chit, ctmin, vec.INF), axis=1,
                         keepdims=True)
            kc.append(kk)
            ca.append(kk < vec.INF)
            cidx.append(ci)

        def push(stk, do, val):
            rolled = pltpu.roll(stk, 1, 1)
            inserted = jnp.where(lane == 0, val, rolled)
            return jnp.where(do, inserted, stk)

        bk = jnp.full((G, 1), vec.INF, jnp.float32)
        bnear = jnp.full((G, 1), -1, jnp.int32)
        bnearv = jnp.zeros((G, 1), jnp.int32)
        for c in range(k):
            better = ca[c] & (kc[c] < bk)
            bk = jnp.where(better, kc[c], bk)
            bnear = jnp.where(better, c, bnear)
            bnearv = jnp.where(better, cidx[c], bnearv)
        for c in range(k - 1, -1, -1):
            stk = push(stk, ca[c] & (bnear != c), cidx[c])

        nxt_ok = bnear >= 0
        top = stk[:, 0:1]
        popped = jnp.where(lane == L - 1, sentinel,
                           pltpu.roll(stk, L - 1, 1))
        stk = jnp.where(active & jnp.logical_not(nxt_ok), popped, stk)
        new_cur = jnp.where(active, jnp.where(nxt_ok, bnearv, top), cur)

        start_fetch(s, new_cur)
        if mt_gate:
            lrow = lscr[:]
            bt, bs, bu, bv = jax.lax.cond(
                jnp.any(leaf_ok),
                lambda args: wk.packet_mt(
                    lrow, leaf_size, leaf_ok, o3, d3, first,
                    args, wk.accept_closest),
                lambda args: args,
                (bt, bs, bu, bv))
        else:
            bt, bs, bu, bv = wk.packet_mt(
                lscr[:], leaf_size, leaf_ok, o3, d3, first,
                (bt, bs, bu, bv), wk.accept_closest)
        return new_cur, stk, bt, bs, bu, bv

    def cond(s):
        curA, curB = s[0], s[1]
        it = s[2]
        alive = jnp.logical_or(jnp.any(curA < end), jnp.any(curB < end))
        return jnp.logical_and(alive, it < max_iters)

    def body(s):
        curA, curB, it, pA, pB = s
        curA, *pA = phase(0, curA, pA[0], *pA[1:])
        curB, *pB = phase(1, curB, pB[0], *pB[1:])
        return curA, curB, it + 1, tuple(pA), tuple(pB)

    t0 = tmax_ref[0, :].reshape(2, G, L)

    def pinit(s):
        return (
            jnp.full((G, L), end, jnp.int32),        # stack
            t0[s],                                   # best t
            jnp.full((G, L), -1, jnp.int32),         # best slot
            jnp.zeros((G, L), jnp.float32),          # u
            jnp.zeros((G, L), jnp.float32),          # v
        )

    cur0 = jnp.full((G, 1), base, jnp.int32)
    start_fetch(0, cur0)
    start_fetch(1, cur0)
    init = (cur0, cur0, jnp.int32(0), pinit(0), pinit(1))
    curA, curB, _, pA, pB = jax.lax.while_loop(cond, body, init)
    wait_fetch(0, curA)   # drain both in-flight DMAs
    wait_fetch(1, curB)
    bt = jnp.stack([pA[1], pB[1]]).reshape(2 * G * L)
    bs = jnp.stack([pA[2], pB[2]]).reshape(2 * G * L)
    bu = jnp.stack([pA[3], pB[3]]).reshape(2 * G * L)
    bv = jnp.stack([pA[4], pB[4]]).reshape(2 * G * L)
    t_ref[0, :] = jnp.where(bs >= 0, bt, vec.INF)
    slot_ref[0, :] = bs
    u_ref[0, :] = bu
    v_ref[0, :] = bv


def pallas_traverse_ordered8_fat_dual(fat, org, dirn, t_max,
                                      base: int, end: int,
                                      leaf_size: int, k: int,
                                      max_iters: int | None = None,
                                      interpret: bool | None = None,
                                      mt_gate: bool = False):
    """Closest-hit over a pack_fat table with the dual-packet pipelined
    kernel (see _kernel8_ord_fat_dual). Same contract as
    pallas_traverse_ordered8_fat."""
    if max_iters is None:
        max_iters = int(end) - int(base) + 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = 2048
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tm = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tm = jnp.concatenate([tm, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tm2 = tm.reshape(1, rp)
    kern = functools.partial(
        _kernel8_ord_fat_dual, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        mt_gate=bool(mt_gate),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.int32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
    )
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    t, slot, u, v = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        scratch_shapes=[
            pltpu.VMEM((32, 128), jnp.float32),   # fat pairs, 2 packets
            pltpu.VMEM((8, 128), jnp.float32),    # node rows (shared)
            pltpu.VMEM((8, 128), jnp.float32),    # leaf rows (shared)
            pltpu.SemaphoreType.DMA((16,)),
        ],
        interpret=interpret,
    )(fat, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]
