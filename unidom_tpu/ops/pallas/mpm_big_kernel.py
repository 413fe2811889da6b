"""Windowed/chunked fused Pallas TPU kernel: big-grid MPM macro steps.

Covers the configurations outside ops/pallas/mpm_kernel.py's ceiling
(grid planes <= ~196k cells, P <= 4096): pour_soup trains at res
(128, 64, 128) ~= 1M cells (reference pour_soup_env.py:29-181) and
shape_elasto_plastic at ~24-34k particles (shape_elasto_plastic.py:23-110).
The XLA fallback at these scales is scatter-bound (0.41 env-steps/s at
pour_soup res, runs/r3/bigrid_rows.jsonl); this kernel keeps the whole
grid resident in VMEM (v5e has 128 MiB physical; pour_soup's 4 f32 planes
are 16 MB) and windows the dense tensor-product transfers.

Design deltas vs the small fused kernel (same SoA component layout,
reference semantics mpm_simulator.py:178-330 / primitives.py:154-239):

- **x-windowed transfers.** Particles are sorted by x grid cell on the XLA
  side each macro step (``_pack``); each 128-particle chunk computes a
  dynamic window origin ``ox`` (masked-min of its x cells, re-derived every
  substep so drift never accumulates) and evaluates the x basis only on a
  static ``WX``-row window. P2G/G2P become (WX, PC) @ (PC, ry*rz) matmuls
  — an rx/WX FLOP cut vs the full dense form, which is what makes a 1M-cell
  grid affordable. Support outside the window is dropped, mirroring the
  reference's silent out-of-bounds scatter drop (mpm_simulator.py:189-192);
  with per-substep origins this requires a single sorted chunk to spread
  >WX-3 cells apart *within one macro step* — diagnosed by the oracle
  parity tests at representative configs.
- **Chunk loops are ``lax.fori_loop``s** over a VMEM-resident particle
  state scratch (the small kernel Python-unrolls its <=32 chunks; 24k
  particles is 187 chunks). Per-particle stress math (SVD, plasticity)
  stays vectorized over the full (NC, PC) block outside the loop.
- **Grid ops run once per cell** over static x-slabs (not per window — the
  windows overlap), in place on the VMEM grid scratch.
- **Staged backward.** One substep's adjoint per kernel call (the XLA side
  drives the reverse scan + sqrt-checkpoint segmentation exactly like the
  small kernel), but internally the substep adjoint is composed from
  ``jax.vjp`` of the four stages — stress math (vectorized), P2G (per
  chunk), grid ops (per slab), G2P+advect (per chunk) — so linearization
  residuals never exceed one slab/chunk instead of the whole grid.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unidom_tpu.ops import m3
from unidom_tpu.ops.svd3 import svd3_soa
from unidom_tpu.ops.pallas.mpm_kernel import (
    N_COMP,
    PRIM_COLS,
    TRAJ_COLS,
    _IX,
    _IV,
    _IC,
    _IF,
    _IJ,
    _SOA_SDFS,
    _qinv,
    _qmul,
    _qrot,
    _sdf_normal_soa,
    _spline,
    _w2quat,
)

PC = 128  # particle chunk width (lane dim)


def _pc(res):
    """Chunk width. Round 5: always 128 — the per-chunk residual planes
    that forced PC=64 at wide planes in round 4 are (3PC, WY*rz) once the
    y-window caps the lane extent (2048 lanes at pour_soup res instead of
    8192), so full-lane chunks fit the backward's VMEM budget again."""
    return 128

# one resident history block budget (fwd checkpoint block and per-segment
# recompute block each stage through VMEM as whole output blocks).
# Round 5: 36 MB — lets steps<=25 configs at pour_soup/shape_elasto scale
# run CKPT_K=1 (no segment-recompute pass in the backward, ~1 fwd saved per
# substep); fwd-kernel VMEM = 2x hist block (pipelining) + scratch stays
# under the 126 MB limit at both true-res configs.
_HIST_BUDGET = 36 * 2**20
# grid scratch budget: fwd needs 4 planes, bwd 4 (recompute) + 3 (post-op)
# + 3 (d_post/d_raw, aliased) + 1 (d_mass) = 11, plus slack for transients
_GRID_BUDGET = 56 * 2**20


def _nc(n_particles, pc=PC):
    return -(-n_particles // pc)


def _ckpt_stride(steps, nc, pc=PC):
    blk = N_COMP * nc * pc * 4
    max_entries = max(_HIST_BUDGET // blk, 1)
    if steps <= max_entries:
        return 1
    k = int(math.ceil(math.sqrt(steps)))
    return min(max(k, int(-(-steps // max_entries))), max_entries)


def _window(res):
    """Static x-window width. Origins must be 8-aligned (Mosaic requires
    dynamic sublane offsets provably multiple-of-8), which costs up to 7
    rows of coverage at the bottom of the window — widths are sized so the
    usable extent (WX - 3 stencil - 7 alignment) still comfortably covers a
    sorted chunk's x spread (measured <= 5 cells on a pour_soup rollout,
    runs/r5/window_diag_pour_soup.json).

    Round 5: rx <= 32 runs DENSE in x (WX = rx, origin statically 0) — the
    stacked-transfer M dim 4*rx already fills the MXU and there is no
    coverage hazard. Above that, WX=24 (usable 14) up to rx=64 and WX=32
    (usable 22) beyond: measured per-chunk x spreads under the (x, y) sort
    are <= 1 cell at shape_elasto res and <= 5 at pour_soup res
    (runs/r5/window_diag_*.json), and the transfer FLOPs scale with WX
    (dense-x at rx=48 measured ~2x the matmul work for no fill gain)."""
    rx = res[0]
    if rx <= 32:
        return rx  # dense: origin is the constant 0
    return 24 if rx <= 64 else 32


def _ywindow(res):
    """Static y-window height, or ry (no windowing).

    Lane-dim windows need 128-aligned lane offsets. With rz a multiple of
    128 every oy*rz is aligned (no alignment coverage loss; usable extent
    WY - 3). Otherwise origins are restricted to multiples of
    A = 128/gcd(rz, 128) — e.g. rz=48 -> A=8 (8*48 = 3*128) — costing up
    to A-1 rows of coverage at the bottom. The window is used only when
    the usable extent still comfortably covers measured chunk spreads
    (pour_soup y <= 9, shape_elasto y <= 4 —
    runs/r5/window_diag_*.json) and it cuts the plane at least 2x."""
    ry, rz = res[1], res[2]
    wy = 16
    align = 128 // math.gcd(rz, 128)
    if ry < 2 * wy or (wy * rz) % 128 != 0:
        return ry
    usable = wy - 3 - (align - 1)
    if usable < 6:
        return ry
    return wy


def mpm_big_kernel_supported(sim):
    """Whether the windowed kernel covers this simulator's configuration."""
    conf = sim.conf
    rx, ry, rz = conf.res
    if rx * ry * rz * 4 * 12 > _GRID_BUDGET:
        return False
    if any(name not in _SOA_SDFS for name in sim.sdf_names):
        return False
    if sim.n_particles > 128 * 1024:
        return False
    # Wide planes (>4096 lanes) force SX=8; a ragged rx would take the
    # unrolled slab-adjoint tail, whose stacked residual planes at that
    # scale produced a 585 MB register-spill VMEM footprint
    # (runs/r4/bench_pour_soup.log). They also require the y-window (the
    # full-lane chunk residual planes are what broke the round-4 backward);
    # _ywindow returns ry when no lane-aligned window exists. Fall back to
    # XLA otherwise.
    if ry * rz > 4096 and (rx % 8 != 0 or _ywindow((rx, ry, rz)) == ry):
        return False
    pc = _pc(conf.res)
    nc = _nc(sim.n_particles, pc)
    blk = N_COMP * nc * pc * 4
    k = _ckpt_stride(conf.steps, nc, pc)
    if k * blk > _HIST_BUDGET or -(-conf.steps // k) * blk > _HIST_BUDGET:
        return False
    return True


def build_mpm_big_step_kernel(sim, interpret=False, dtype=jnp.float32):
    """Build step_batch(state, action) -> (state, state) with a custom VJP.
    ``sim`` is a finalized MPMSimulator whose config passes
    ``mpm_big_kernel_supported``.

    ``dtype=jnp.bfloat16`` casts ONLY the transfer-matmul operands (the
    stacked lhs/rhs/GG blocks) with f32 accumulation — the r4-validated
    subset of the small kernel's bf16 scheme (action-grad cosine 0.998+,
    tests/test_kernel_dtype.py). All state, spline evaluation, grid ops and
    comparisons stay f32, which avoids every recorded Mosaic packed-bf16
    cmpf failure site (runs/r4/bench_bf16_mpm.log)."""
    conf = sim.conf
    rx, ry, rz = conf.res
    ryrz = ry * rz
    steps = conf.steps
    dt, dx, inv_dx = conf.dt, conf.dx, conf.inv_dx
    p_mass, p_vol = conf.p_mass, conf.p_vol
    grav = tuple(float(g) for g in conf.gravity)
    n_grid = conf.n_grid
    n_prim = len(sim.sdf_names)
    use_pc = sim.use_position_control
    sdfs = [_SOA_SDFS[name] for name in sim.sdf_names]

    P = sim.n_particles
    PC = _pc(conf.res)  # shadows the module default inside this build
    NC = _nc(P, PC)
    PPAD = NC * PC
    WX = _window(conf.res)
    DENSE_X = WX == rx  # x origin statically 0, no coverage hazard
    WY = _ywindow(conf.res)
    USE_YW = WY != ry  # lane-dim windows (rz % 128 == 0 guaranteed)
    NW = WY * rz  # transfer-plane lane extent (ryrz when not windowed)
    # static grid-op slab split (last slab may be shorter). Slab planes are
    # (SX, ryrz) live values in the kernel: cap them at ~256 kB so the
    # backward's per-slab linearization fits VMEM at 1M-cell grids.
    SX = min(rx, 16 if ryrz <= 4096 else 8)
    slab_rows = [(s, min(SX, rx - s)) for s in range(0, rx, SX)]

    CKPT_K = _ckpt_stride(steps, NC, PC)
    N_CKPT = -(-steps // CKPT_K)
    # Store the raw (pre-grid-op) grid per substep as a forward output so
    # the backward skips its whole-P2G recompute pass (~1 of ~4 chunk
    # passes). Only for small planes where the (steps, 4, rx, ryrz) block
    # streams through VMEM (shape_elasto 18.9 MB; pour_soup would be
    # 419 MB -> keeps the recompute there).
    STORE_GRAW = CKPT_K == 1 and steps * 4 * rx * ryrz * 4 <= 24 * 2**20

    mat = np.asarray(sim.material)
    has_water = bool((mat == 0).any())
    has_plastic = bool((mat == 2).any())
    has_vm = bool((mat == 3).any())

    # static per-particle attribute table in ORIGINAL particle order; _pack
    # permutes it with the per-step sort (5, P): valid, h, water, clip, vm
    consts_np = np.zeros((5, P), np.float32)
    consts_np[0] = 1.0
    consts_np[1] = np.clip(np.asarray(sim.h), 0.1, 5.0)
    consts_np[2] = (mat == 0).astype(np.float32)
    consts_np[3] = (mat == 2).astype(np.float32)
    consts_np[4] = (mat == 3).astype(np.float32)
    CONSTS_BASE = jnp.asarray(consts_np)

    # ---------------- pure stage functions (values in, values out) -------- #

    def _mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def _mm_t(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def stage1(C, F, mu_raw, la_raw, ys, h, water, plastic_m, vm_m):
        """Deformation-gradient update + stress, vectorized over (NC, PC).
        Returns (Fn nested 3x3, affine nested 3x3). Mirrors engine/mpm.py
        _substep's pre-P2G section and the small kernel's make_substep."""
        water_b = water > 0.5
        plastic_b = plastic_m > 0.5
        vm_b = vm_m > 0.5

        Fn = m3.matmul(m3.add(m3.eye_like(C[0][0]), m3.scale(C, dt)), F)
        mu = mu_raw * h
        la = la_raw * h
        if has_water:
            mu = jnp.where(water_b, 0.0, mu)
            la = jnp.where(water_b, 1.0, la)

        U, sig, V = svd3_soa(Fn)
        if has_plastic:
            sig = tuple(
                jnp.where(
                    plastic_b,
                    jnp.clip(s, 1 - 2.5e-2 * 10, 1 + 4.5e-3 * 100),
                    s,
                )
                for s in sig
            )
        Jdet = sig[0] * sig[1] * sig[2]
        if has_plastic:
            Fn = m3.where(
                plastic_b, m3.matmul_nt(m3.scale_cols(U, sig), V), Fn
            )
        if has_vm:
            sig_vm = tuple(jnp.maximum(s, 0.05) for s in sig)
            eps = tuple(jnp.log(s) for s in sig_vm)
            eps_mean = (eps[0] + eps[1] + eps[2]) / 3.0
            eps_hat = tuple(e - eps_mean for e in eps)
            ehn = jnp.sqrt(
                eps_hat[0] ** 2 + eps_hat[1] ** 2 + eps_hat[2] ** 2 + 1e-12
            )
            delta_gamma = ehn - ys / (2.0 * mu + 1e-12)
            yields = delta_gamma > 0
            dgp = jnp.clip(delta_gamma, 0.0, None)
            scale = dgp / ehn
            sig_proj = tuple(
                jnp.where(yields, jnp.exp(e - scale * eh), sv)
                for e, eh, sv in zip(eps, eps_hat, sig_vm)
            )
            Fn = m3.where(
                vm_b, m3.matmul_nt(m3.scale_cols(U, sig_proj), V), Fn
            )

        R = m3.matmul_nt(U, V)
        FFt = m3.matmul_nt(m3.sub(Fn, R), Fn)
        coef = -dt * p_vol * 4.0 / dx**2
        diag_term = la * Jdet * (Jdet - 1.0)
        affine = tuple(
            tuple(
                coef * (2.0 * mu * FFt[i][j] + (diag_term if i == j else 0.0))
                + p_mass * C[i][j]
                for j in range(3)
            )
            for i in range(3)
        )
        return Fn, affine

    def window_origin(x0_row, vmask):
        """Chunk x-window origin (int32 scalar, 8-aligned) from the chunk's
        x row (1, PC) + validity row. Covers min(base) .. min(base)+WX-1
        minus up to 7 alignment rows (see _window)."""
        if DENSE_X:
            return 0
        mn = jnp.min(jnp.where(vmask > 0.5, x0_row, 1e9))
        ox = jnp.floor(mn * inv_dx - 0.5).astype(jnp.int32)
        ox = jnp.clip(ox, 0, rx - WX)
        # rx and WX are multiples of 8, so the aligned origin stays in range
        return pl.multiple_of((ox // 8) * 8, 8)

    def window_origin_y(x1_row, vmask):
        """Chunk y-window origin as a LANE offset oy*rz (int32 scalar,
        128-aligned). Origins are restricted to multiples of
        A = 128/gcd(rz, 128) so oy*rz is always a lane-tile multiple
        (A == 1 when rz % 128 == 0 — no rounding loss there)."""
        if not USE_YW:
            return 0
        mn = jnp.min(jnp.where(vmask > 0.5, x1_row, 1e9))
        oy = jnp.floor(mn * inv_dx - 0.5).astype(jnp.int32)
        oy = jnp.clip(oy, 0, ry - WY)
        align = 128 // math.gcd(rz, 128)
        if align > 1:
            oy = (oy // align) * align
        return pl.multiple_of(oy * rz, 128)

    def _read_win(ref, ch, ox, oyl):
        """(WX, NW) window of grid plane ch at (ox, oy*rz)."""
        xs = slice(None) if DENSE_X else pl.ds(ox, WX)
        if USE_YW:
            return ref[ch, xs, pl.ds(oyl, NW)]
        return ref[ch, xs, :]

    def _acc_win(ref, ch, ox, oyl, val):
        """ref[ch, window] += val (read-modify-write on dynamic offsets)."""
        xs = slice(None) if DENSE_X else pl.ds(ox, WX)
        if USE_YW:
            ref[ch, xs, pl.ds(oyl, NW)] += val
        else:
            ref[ch, xs, :] += val

    def _chunk_bases(xc, vmask, ox, oyl):
        """Windowed bases for one chunk. xc: 3-tuple of (1, PC). Returns
        wx, wxd (WX, PC) and the lane-stacked rhs block
        [byc; byc_yd; byc_zd] (3PC, NW)."""
        oxf = jnp.asarray(ox).astype(jnp.float32)
        i = jax.lax.broadcasted_iota(jnp.int32, (WX, PC), 0).astype(jnp.float32)
        t = (i + oxf) - xc[0] * inv_dx
        wx = _spline(t) * vmask
        wxd = wx * t
        oyf = (jnp.asarray(oyl) // rz).astype(jnp.float32)
        jk = jax.lax.broadcasted_iota(jnp.int32, (PC, NW), 1)
        yd = jnp.transpose(xc[1]) * inv_dx  # (PC, 1)
        zd = jnp.transpose(xc[2]) * inv_dx
        ty = ((jk // rz).astype(jnp.float32) + oyf) - yd
        tz = (jk % rz).astype(jnp.float32) - zd
        wy = _spline(ty)
        wz = _spline(tz)
        rhs = jnp.concatenate(
            [wy * wz, (wy * ty) * wz, wy * (wz * tz)], axis=0
        )  # (3PC, NW)
        return wx, wxd, rhs

    # Stacked transfers (round-5 MXU rework, mirroring the small kernel's
    # round-4 form): the round-4 big kernel issued 19 matmuls per chunk per
    # substep with M = WX (32) and K = PC (64), filling ~13% of the 128x128
    # MXU. Stacking the three channels + the mass row along M and the three
    # basis planes along K makes each transfer ONE matmul:
    #   P2G = (4WX, 3PC) @ (3PC, NW)       (M >= 128, K = 384)
    #   G2P = (3WX, NW) @ (NW, 3PC)        (K = NW >= 1536)
    # and the y-window caps NW at WY*rz (pour_soup: 2048 instead of 8192),
    # which is both the FLOP cut and what lets PC stay 128.

    def p2g_chunk(xc, vc, affc, vmask, ox, oyl):
        """One chunk's windowed stacked P2G -> (4WX, NW): rows
        [0:WX) ch0, [WX:2WX) ch1, [2WX:3WX) ch2, [3WX:4WX) mass."""
        wx, wxd, rhs = _chunk_bases(xc, vmask, ox, oyl)
        zero = jnp.zeros((WX, PC), jnp.float32)
        rows = []
        for ch in range(3):
            p0 = wx * (p_mass * vc[ch]) + (dx * affc[ch][0]) * wxd
            p1 = (dx * affc[ch][1]) * wx
            p2 = (dx * affc[ch][2]) * wx
            rows.append(jnp.concatenate([p0, p1, p2], axis=1))
        rows.append(jnp.concatenate([wx * p_mass, zero, zero], axis=1))
        lhs = jnp.concatenate(rows, axis=0)  # (4WX, 3PC)
        return _mm(lhs.astype(dtype), rhs.astype(dtype))

    def g2p_chunk(xc, Jc, GG, vmask, ox, oyl):
        """One chunk's windowed stacked G2P + advection. GG: (3WX, NW)
        channel-stacked post-op grid windows. Returns (new_x 3-tuple
        (1, PC), new_v, new_C nested, new_J)."""
        wx, wxd, rhs = _chunk_bases(xc, vmask, ox, oyl)
        M_all = _mm_t(GG.astype(dtype), rhs.astype(dtype))  # (3WX, 3PC)
        nv = []
        nC = [[None] * 3 for _ in range(3)]
        for ch in range(3):
            rows = M_all[ch * WX : (ch + 1) * WX]
            M = rows[:, 0:PC]
            nv.append(jnp.sum(wx * M, axis=0, keepdims=True))
            nC[ch][0] = 4.0 * inv_dx * jnp.sum(wxd * M, axis=0, keepdims=True)
            M_yd = rows[:, PC : 2 * PC]
            nC[ch][1] = 4.0 * inv_dx * jnp.sum(wx * M_yd, axis=0, keepdims=True)
            M_zd = rows[:, 2 * PC : 3 * PC]
            nC[ch][2] = 4.0 * inv_dx * jnp.sum(wx * M_zd, axis=0, keepdims=True)
        new_v = tuple(nv)
        new_C = tuple(tuple(nC[i][j] for j in range(3)) for i in range(3))
        new_x = tuple(xc[i] + dt * new_v[i] for i in range(3))
        new_J = Jc * (1.0 + dt * (new_C[0][0] + new_C[1][1] + new_C[2][2]))
        return new_x, new_v, new_C, new_J

    def fk(prims, theta):
        """One substep of primitive FK on rank-0 scalars
        (engine/primitives.py forward_kinematics)."""
        new_prims = []
        for ip in range(n_prim):
            p_cur, q_cur = prims[ip]
            vstep, wstep = theta[ip][0], theta[ip][1]
            p_next = tuple(
                jnp.clip(p_cur[i] + vstep[i], -2.0, 2.0) for i in range(3)
            )
            q_next = _qmul(_w2quat(wstep), q_cur)
            new_prims.append((p_next, q_next))
        return tuple(new_prims)

    def gridop_slab(g, gm, prims, new_prims, theta, gf, row0, S):
        """Grid ops on one static x-slab: momentum->velocity, gravity,
        primitive collide / position control, ground friction, walls.
        g: 3-tuple (S, ryrz); gm (S, ryrz); prim data as rank-0 scalars.
        row0/S static. Mirrors the small kernel's grid-op section
        (mpm_simulator.py:280-313 semantics)."""
        mass_mask = gm > 1e-10
        safe_m = jnp.where(mass_mask, gm, 1.0)
        g = tuple(jnp.where(mass_mask, g[i] / safe_m, g[i]) for i in range(3))
        g = tuple(g[i] + dt * grav[i] for i in range(3))

        xi = jax.lax.broadcasted_iota(jnp.int32, (S, ryrz), 0) + row0
        jk = jax.lax.broadcasted_iota(jnp.int32, (S, ryrz), 1)
        yi = jk // rz
        zi = jk % rz
        gx = (xi.astype(jnp.float32) * dx, yi.astype(jnp.float32) * dx,
              zi.astype(jnp.float32) * dx)

        for ip in range(n_prim):
            p_cur, q_cur = prims[ip]
            p_next, q_next = new_prims[ip]
            vstep, _, size, fric, soft = theta[ip]
            rel = tuple(gx[i] - p_cur[i] for i in range(3))
            local = _qrot(_qinv(q_cur), rel)
            dist = sdfs[ip](size, local)
            if use_pc:
                control = dist < size[0] * 1.5
                g = tuple(
                    jnp.where(control, vstep[i] / dt, g[i]) for i in range(3)
                )
            else:
                influence = jnp.clip(jnp.exp(-dist * soft), -jnp.inf, 1.0)
                D = _qrot(q_cur, _sdf_normal_soa(sdfs[ip], size, local))
                new_pos = _qrot(q_next, local)
                new_pos = tuple(new_pos[i] + p_next[i] for i in range(3))
                cv = tuple((new_pos[i] - gx[i]) / dt for i in range(3))
                input_v = tuple(g[i] - cv[i] for i in range(3))
                nrm = m3.dot3(input_v, D)
                vt = tuple(
                    input_v[i] - jnp.clip(nrm, -jnp.inf, 0.0) * D[i]
                    for i in range(3)
                )
                vt_dot = m3.dot3(vt, vt)
                vt_norm = jnp.sqrt(vt_dot + 1e-12)
                fric_scale = jnp.clip(
                    vt_norm + nrm * fric, 1e-12, jnp.inf
                ) / vt_norm
                flag = (
                    (nrm < 0).astype(jnp.float32)
                    * (jnp.sqrt(vt_dot) > 1e-12).astype(jnp.float32)
                )
                vt = tuple(
                    (vt[i] * fric_scale) * flag + vt[i] * (1.0 - flag)
                    for i in range(3)
                )
                g = tuple(
                    cv[i] + input_v[i] * (1.0 - influence) + vt[i] * influence
                    for i in range(3)
                )

        # ground friction, bottom 3 layers (mpm_simulator.py:296-307)
        gidx = (xi.astype(jnp.float32), yi.astype(jnp.float32),
                zi.astype(jnp.float32))
        lin = g[1] + 1e-30
        vit = (g[0] - gidx[0] * 1e-30,
               g[1] - lin - gidx[1] * 1e-30,
               g[2] - gidx[2] * 1e-30)
        lit = jnp.sqrt(
            (vit[0] + 1e-12) ** 2 + (vit[1] + 1e-12) ** 2
            + (vit[2] + 1e-12) ** 2
        )
        coef_f = jnp.clip(1.0 + gf * lin / lit, 0.0, jnp.inf)
        gfric = tuple(coef_f * (vit[i] + gidx[i] * 1e-30) for i in range(3))
        gfric = (gfric[0], jnp.zeros_like(gfric[1]), gfric[2])
        fmask = (yi < 3) & (g[1] <= 0)
        g = tuple(jnp.where(fmask, gfric[i], g[i]) for i in range(3))

        idx = (xi, yi, zi)
        g = tuple(
            jnp.where(
                ((idx[i] < 3) & (g[i] < 0))
                | ((idx[i] > n_grid - 3) & (g[i] > 0)),
                0.0,
                g[i],
            )
            for i in range(3)
        )
        return g

    # ---------------- ref plumbing helpers ---------------- #

    def _read_prims(prim_ref):
        """(1, n_prim, 1, PRIM_COLS) -> ((p, q) rank-0 tuples, theta)."""
        prims, theta = [], []
        for ip in range(n_prim):
            row = prim_ref[0, ip]  # (1, PRIM_COLS)
            sc = lambda j: row[0, j]
            p = (sc(0), sc(1), sc(2))
            q = (sc(3), sc(4), sc(5), sc(6))
            vstep = (sc(7), sc(8), sc(9))
            wstep = (sc(10), sc(11), sc(12))
            size = (sc(13), sc(14), sc(15))
            prims.append((p, q))
            theta.append((vstep, wstep, size, sc(16), sc(17)))
        return tuple(prims), tuple(theta)

    def _read_prim_rows(ref):
        """(1, n_prim, 1, TRAJ_COLS) -> ((p, q), ...) rank-0 scalars."""
        out = []
        for ip in range(n_prim):
            row = ref[0, ip]  # (1, TRAJ_COLS)
            p = tuple(row[0, i] for i in range(3))
            q = tuple(row[0, 3 + i] for i in range(4))
            out.append((p, q))
        return tuple(out)

    def _row7(scalars):
        """7 rank-0 scalars -> (1, 7) via (1, 1) reshapes (no 1-D
        intermediates — Mosaic-safe)."""
        return jnp.concatenate([s.reshape(1, 1) for s in scalars], axis=1)

    def _traj_row(prim):
        p, q = prim
        row = _row7(list(p) + list(q))
        return jnp.pad(row, ((0, 0), (0, TRAJ_COLS - 7)))

    def _read_comps(ref, idx0, n):
        return tuple(ref[idx0 + i] for i in range(n))

    def _read_carry_refs(ps):
        x = _read_comps(ps, _IX, 3)
        v = _read_comps(ps, _IV, 3)
        C = tuple(tuple(ps[_IC + 3 * i + j] for j in range(3)) for i in range(3))
        F = tuple(tuple(ps[_IF + 3 * i + j] for j in range(3)) for i in range(3))
        J = ps[_IJ]
        return x, v, C, F, J

    def _row(ref, k, c):
        """Row c of component k from a (N, NC, PC) scratch ref -> (1, PC)."""
        return ref[k, pl.ds(c, 1), :]

    # ---------------- one full substep on scratch refs ---------------- #

    def run_substep(ps, aff, grid, consts, vrow, mats, gf, prims, theta,
                    graw_ref=None, t=None):
        """Advance ps (N_COMP, NC, PC) in place by one substep using grid
        (4, rx, ryrz) and aff (9, NC, PC) scratch. Returns new_prims.
        ``graw_ref``/``t``: optional (1, steps, 4, rx, ryrz) output ref to
        record the raw post-P2G grid (STORE_GRAW)."""
        valid, h, water, plastic_m, vm_m = (consts[i] for i in range(5))
        mu_raw, la_raw, ys = mats

        # stage 1, vectorized over all chunks
        _, _, C, F, _ = _read_carry_refs(ps)
        Fn, affine = stage1(C, F, mu_raw, la_raw, ys, h, water, plastic_m, vm_m)
        for i in range(3):
            for j in range(3):
                ps[_IF + 3 * i + j] = Fn[i][j]
                aff[3 * i + j] = affine[i][j]

        # P2G over chunks
        for ch in range(4):
            grid[ch] = jnp.zeros((rx, ryrz), jnp.float32)

        def p2g_body(c, _):
            xc = tuple(_row(ps, _IX + i, c) for i in range(3))
            vc = tuple(_row(ps, _IV + i, c) for i in range(3))
            affc = tuple(
                tuple(_row(aff, 3 * i + j, c) for j in range(3))
                for i in range(3)
            )
            vmask = vrow(c)
            ox = window_origin(xc[0], vmask)
            oyl = window_origin_y(xc[1], vmask)
            G4 = p2g_chunk(xc, vc, affc, vmask, ox, oyl)  # (4WX, NW)
            for ch in range(4):
                _acc_win(grid, ch, ox, oyl, G4[ch * WX : (ch + 1) * WX])
            return 0

        jax.lax.fori_loop(0, NC, p2g_body, 0)

        if graw_ref is not None:
            for ch in range(4):
                graw_ref[0, t, ch] = grid[ch]

        new_prims = fk(prims, theta)

        # grid ops in place, one static slab at a time
        for row0, S in slab_rows:
            g = tuple(grid[ch, row0 : row0 + S, :] for ch in range(3))
            gm = grid[3, row0 : row0 + S, :]
            g = gridop_slab(g, gm, prims, new_prims, theta, gf, row0, S)
            for ch in range(3):
                grid[ch, row0 : row0 + S, :] = g[ch]

        # G2P + advect over chunks
        def g2p_body(c, _):
            xc = tuple(_row(ps, _IX + i, c) for i in range(3))
            Jc = _row(ps, _IJ, c)
            vmask = vrow(c)
            ox = window_origin(xc[0], vmask)
            oyl = window_origin_y(xc[1], vmask)
            GG = jnp.concatenate(
                [_read_win(grid, ch, ox, oyl) for ch in range(3)], axis=0
            )
            new_x, new_v, new_C, new_J = g2p_chunk(xc, Jc, GG, vmask, ox, oyl)
            for i in range(3):
                ps[_IX + i, pl.ds(c, 1), :] = new_x[i]
                ps[_IV + i, pl.ds(c, 1), :] = new_v[i]
                for j in range(3):
                    ps[_IC + 3 * i + j, pl.ds(c, 1), :] = new_C[i][j]
            ps[_IJ, pl.ds(c, 1), :] = new_J
            return 0

        jax.lax.fori_loop(0, NC, g2p_body, 0)
        return new_prims

    # ---------------- forward kernel ---------------- #

    def _read_inputs(mat_ref, scal_ref, const_ref):
        consts = tuple(const_ref[0, i] for i in range(5))
        mats = tuple(mat_ref[0, i] for i in range(3))
        gf = scal_ref[0, 0, 0]  # (1, 1, 8) block -> rank-0
        # per-chunk validity row read straight off the ref: lax.dynamic_slice
        # on a loaded VALUE has no Mosaic lowering (KernelType.TC), ref
        # indexing with pl.ds does
        vrow = lambda c: const_ref[0, 0, pl.ds(c, 1), :]
        return consts, vrow, mats, gf

    def fwd_kernel(state_ref, mat_ref, scal_ref, prim_ref, const_ref,
                   out_ref, traj_ref, hist_ref, hist_prim_ref,
                   *rest):
        if STORE_GRAW:
            graw_ref, ps, aff, grid = rest
        else:
            graw_ref = None
            ps, aff, grid = rest
        consts, vrow, mats, gf = _read_inputs(mat_ref, scal_ref, const_ref)
        prims, theta = _read_prims(prim_ref)
        for k in range(N_COMP):
            ps[k] = state_ref[0, k]

        def _store_ckpt(s, prims):
            for k in range(N_COMP):
                hist_ref[0, s, k] = ps[k]
            for ip in range(n_prim):
                hist_prim_ref[0, s, ip] = _traj_row(prims[ip])

        def body(t, prims):
            if CKPT_K == 1:
                _store_ckpt(t, prims)
            else:
                @pl.when(t % CKPT_K == 0)
                def _():
                    _store_ckpt(t // CKPT_K, prims)
            new_prims = run_substep(ps, aff, grid, consts, vrow, mats, gf,
                                    prims, theta, graw_ref, t)
            for ip in range(n_prim):
                traj_ref[0, ip, pl.ds(t + 1, 1), :] = _traj_row(new_prims[ip])
            return new_prims

        prims = jax.lax.fori_loop(0, steps, body, prims)
        for k in range(N_COMP):
            out_ref[0, k] = ps[k]
        for ip in range(n_prim):  # copy_frame: buffer[0] <- buffer[steps]
            traj_ref[0, ip, pl.ds(0, 1), :] = _traj_row(prims[ip])

    # ---------------- segment-recompute kernel (CKPT_K > 1) --------------- #

    def _make_seg_kernel(L):
        def seg_kernel(start_ref, startprim_ref, mat_ref, scal_ref, prim_ref,
                       const_ref, shist_ref, shist_prim_ref, ps, aff, grid):
            consts, vrow, mats, gf = _read_inputs(mat_ref, scal_ref, const_ref)
            _, theta = _read_prims(prim_ref)
            prims0 = _read_prim_rows(startprim_ref)
            for k in range(N_COMP):
                ps[k] = start_ref[0, k]

            def body(t, prims):
                for k in range(N_COMP):
                    shist_ref[0, t, k] = ps[k]
                for ip in range(n_prim):
                    shist_prim_ref[0, t, ip] = _traj_row(prims[ip])
                return run_substep(ps, aff, grid, consts, vrow, mats, gf, prims, theta)

            jax.lax.fori_loop(0, L, body, prims0)

        return seg_kernel

    # ---------------- per-substep backward kernel ---------------- #

    def bwd_step_kernel(saved_ref, saved_prim_ref, mat_ref, scal_ref,
                        prim_ref, const_ref, gstate_ref, gprim_ref,
                        *rest):
        if STORE_GRAW:
            (saved_graw_ref,
             dstate_ref, dprimc_ref, dmat_ref, dscal_ref, dptheta_ref,
             aff, grid, grid2, dgrid, dgm) = rest
        else:
            saved_graw_ref = None
            (dstate_ref, dprimc_ref, dmat_ref, dscal_ref, dptheta_ref,
             aff, grid, grid2, dgrid, dgm) = rest
        consts, vrow, mats, gf = _read_inputs(mat_ref, scal_ref, const_ref)
        _, theta = _read_prims(prim_ref)
        prims = _read_prim_rows(saved_prim_ref)
        mu_raw, la_raw, ys = mats

        x = tuple(saved_ref[0, _IX + i] for i in range(3))
        v = tuple(saved_ref[0, _IV + i] for i in range(3))
        C = tuple(
            tuple(saved_ref[0, _IC + 3 * i + j] for j in range(3))
            for i in range(3)
        )
        F = tuple(
            tuple(saved_ref[0, _IF + 3 * i + j] for j in range(3))
            for i in range(3)
        )
        J = saved_ref[0, _IJ]

        # 1. stage-1 forward with vjp (residuals: full-batch planes)
        def stage1_in(C, F, mu_raw, la_raw, ys):
            return stage1(C, F, mu_raw, la_raw, ys, consts[1], consts[2],
                          consts[3], consts[4])

        (Fn, affine), vjp1 = jax.vjp(stage1_in, C, F, mu_raw, la_raw, ys)
        for i in range(3):
            for j in range(3):
                aff[3 * i + j] = affine[i][j]

        # 2. raw grid: load the forward's stored planes (STORE_GRAW) or
        # recompute via a P2G pass over chunks
        if STORE_GRAW:
            for ch in range(4):
                grid[ch] = saved_graw_ref[0, ch]
        else:
            for ch in range(4):
                grid[ch] = jnp.zeros((rx, ryrz), jnp.float32)

            def p2g_fwd_body(c, _):
                xc = tuple(
                    saved_ref[0, _IX + i, pl.ds(c, 1), :] for i in range(3)
                )
                vc = tuple(
                    saved_ref[0, _IV + i, pl.ds(c, 1), :] for i in range(3)
                )
                affc = tuple(
                    tuple(_row(aff, 3 * i + j, c) for j in range(3))
                    for i in range(3)
                )
                vmask = vrow(c)
                ox = window_origin(xc[0], vmask)
                oyl = window_origin_y(xc[1], vmask)
                G4 = p2g_chunk(xc, vc, affc, vmask, ox, oyl)
                for ch in range(4):
                    _acc_win(grid, ch, ox, oyl, G4[ch * WX : (ch + 1) * WX])
                return 0

            jax.lax.fori_loop(0, NC, p2g_fwd_body, 0)

        # 3. FK forward with vjp (scalars)
        def fk_in(prims, theta):
            return fk(prims, theta)

        new_prims, vjp_fk = jax.vjp(fk_in, prims, theta)

        # 4. grid-op forward into grid2 (post-op velocities)
        for row0, S in slab_rows:
            g = tuple(grid[ch, row0 : row0 + S, :] for ch in range(3))
            gm = grid[3, row0 : row0 + S, :]
            g = gridop_slab(g, gm, prims, new_prims, theta, gf, row0, S)
            for ch in range(3):
                grid2[ch, row0 : row0 + S, :] = g[ch]

        # 5. G2P + advect adjoint per chunk -> d_gpost (dgrid), d_x, d_J
        for ch in range(3):
            dgrid[ch] = jnp.zeros((rx, ryrz), jnp.float32)

        def g2p_bwd_body(c, _):
            xc = tuple(saved_ref[0, _IX + i, pl.ds(c, 1), :] for i in range(3))
            Jc = saved_ref[0, _IJ, pl.ds(c, 1), :]
            vmask = vrow(c)
            ox = window_origin(xc[0], vmask)
            oyl = window_origin_y(xc[1], vmask)
            GG = jnp.concatenate(
                [_read_win(grid2, ch, ox, oyl) for ch in range(3)], axis=0
            )

            # NOTE: no jax.checkpoint here — Mosaic has no lowering for
            # remat2 inside a TPU kernel (runs/r4/bigrid_parity2.jsonl;
            # interpret mode accepts it silently). Liveness is bounded
            # structurally instead: chunk/slab walks are fori_loops, so one
            # iteration's linearization residuals are live at a time.
            def g2p_in(xc, Jc, GG):
                return g2p_chunk(xc, Jc, GG, vmask, ox, oyl)

            _, vjpB = jax.vjp(g2p_in, xc, Jc, GG)
            gx = tuple(gstate_ref[0, _IX + i, pl.ds(c, 1), :] for i in range(3))
            gv = tuple(gstate_ref[0, _IV + i, pl.ds(c, 1), :] for i in range(3))
            gC = tuple(
                tuple(
                    gstate_ref[0, _IC + 3 * i + j, pl.ds(c, 1), :]
                    for j in range(3)
                )
                for i in range(3)
            )
            gJ = gstate_ref[0, _IJ, pl.ds(c, 1), :]
            dxc, dJc, dGG = vjpB((gx, gv, gC, gJ))
            for i in range(3):
                dstate_ref[0, _IX + i, pl.ds(c, 1), :] = dxc[i]
            dstate_ref[0, _IJ, pl.ds(c, 1), :] = dJc
            for ch in range(3):
                _acc_win(dgrid, ch, ox, oyl, dGG[ch * WX : (ch + 1) * WX])
            return 0

        jax.lax.fori_loop(0, NC, g2p_bwd_body, 0)

        # 6. grid-op adjoint per slab: dgrid (d_gpost) -> d_graw in place,
        # d_gm into dgm, scalar cotangents accumulated in the loop carry.
        # A lax.fori_loop (not a Python unroll) keeps one slab's
        # linearization live at a time — unrolled, the 8 slabs' residual
        # planes at pour_soup res stacked into Mosaic spill slots.
        # (jax.checkpoint cannot help here: Mosaic has no remat2 lowering
        # inside TPU kernels — see the NOTE at g2p_bwd_body.)
        zerof = jnp.zeros((), jnp.float32)
        zeros_like_tree = lambda t: jax.tree_util.tree_map(
            lambda _: zerof, t
        )
        add_tree = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)

        def slab_body(s, carry):
            d_prims_acc, d_newprims_acc, d_theta_acc, d_gf_acc = carry
            row0 = pl.multiple_of(s * SX, 8)
            graw = tuple(grid[ch, pl.ds(row0, SX), :] for ch in range(3))
            gm = grid[3, pl.ds(row0, SX), :]

            def gop_in(graw, gm, prims, new_prims, theta, gf):
                return gridop_slab(graw, gm, prims, new_prims, theta, gf,
                                   row0, SX)

            _, vjpG = jax.vjp(gop_in, graw, gm, prims, new_prims, theta, gf)
            dg = tuple(dgrid[ch, pl.ds(row0, SX), :] for ch in range(3))
            dgraw, dgm_s, dpr, dnpr, dth, dgf = vjpG(dg)
            for ch in range(3):
                dgrid[ch, pl.ds(row0, SX), :] = dgraw[ch]
            dgm[0, pl.ds(row0, SX), :] = dgm_s
            return (
                add_tree(d_prims_acc, dpr),
                add_tree(d_newprims_acc, dnpr),
                add_tree(d_theta_acc, dth),
                d_gf_acc + dgf,
            )

        carry0 = (
            zeros_like_tree(prims),
            zeros_like_tree(new_prims),
            zeros_like_tree(theta),
            zerof,
        )
        if rx % SX == 0:
            d_prims_acc, d_newprims_acc, d_theta_acc, d_gf_acc = (
                jax.lax.fori_loop(0, rx // SX, slab_body, carry0)
            )
        else:  # ragged tail: unrolled static slabs (small grids only)
            carry = carry0
            for row0s, S in slab_rows:
                graw = tuple(grid[ch, row0s : row0s + S, :] for ch in range(3))
                gm = grid[3, row0s : row0s + S, :]

                def gop_in(graw, gm, prims, new_prims, theta, gf,
                           row0s=row0s, S=S):
                    return gridop_slab(graw, gm, prims, new_prims, theta, gf,
                                       row0s, S)

                _, vjpG = jax.vjp(gop_in, graw, gm, prims, new_prims, theta,
                                  gf)
                dg = tuple(dgrid[ch, row0s : row0s + S, :] for ch in range(3))
                dgraw, dgm_s, dpr, dnpr, dth, dgf = vjpG(dg)
                for ch in range(3):
                    dgrid[ch, row0s : row0s + S, :] = dgraw[ch]
                dgm[0, row0s : row0s + S, :] = dgm_s
                carry = (
                    add_tree(carry[0], dpr), add_tree(carry[1], dnpr),
                    add_tree(carry[2], dth), carry[3] + dgf,
                )
            d_prims_acc, d_newprims_acc, d_theta_acc, d_gf_acc = carry

        # 7. P2G adjoint per chunk: d_graw windows -> d_x (+=), d_v, d_affine
        def p2g_bwd_body(c, _):
            xc = tuple(saved_ref[0, _IX + i, pl.ds(c, 1), :] for i in range(3))
            vc = tuple(saved_ref[0, _IV + i, pl.ds(c, 1), :] for i in range(3))
            affc = tuple(
                tuple(_row(aff, 3 * i + j, c) for j in range(3))
                for i in range(3)
            )
            vmask = vrow(c)
            ox = window_origin(xc[0], vmask)
            oyl = window_origin_y(xc[1], vmask)

            def p2g_in(xc, vc, affc):
                return p2g_chunk(xc, vc, affc, vmask, ox, oyl)

            _, vjpP = jax.vjp(p2g_in, xc, vc, affc)
            dG4 = jnp.concatenate(
                [_read_win(dgrid, ch, ox, oyl) for ch in range(3)]
                + [_read_win(dgm, 0, ox, oyl)],
                axis=0,
            )  # (4WX, NW)
            dxc, dvc, daffc = vjpP(dG4)
            for i in range(3):
                cur = dstate_ref[0, _IX + i, pl.ds(c, 1), :]
                dstate_ref[0, _IX + i, pl.ds(c, 1), :] = cur + dxc[i]
                dstate_ref[0, _IV + i, pl.ds(c, 1), :] = dvc[i]
                for j in range(3):
                    aff[3 * i + j, pl.ds(c, 1), :] = daffc[i][j]
            return 0

        jax.lax.fori_loop(0, NC, p2g_bwd_body, 0)

        # 8. stage-1 adjoint (aff now holds d_affine; F cotangent from gstate)
        daffine = tuple(
            tuple(aff[3 * i + j] for j in range(3)) for i in range(3)
        )
        gF = tuple(
            tuple(gstate_ref[0, _IF + 3 * i + j] for j in range(3))
            for i in range(3)
        )
        dC, dF, dmu, dla, dys = vjp1((gF, daffine))
        for i in range(3):
            for j in range(3):
                dstate_ref[0, _IC + 3 * i + j] = dC[i][j]
                dstate_ref[0, _IF + 3 * i + j] = dF[i][j]
        dmat_ref[0, 0] = dmu
        dmat_ref[0, 1] = dla
        dmat_ref[0, 2] = dys

        # 9. FK adjoint: output-prim cotangent (carry + traj row) + grid-op
        # contribution on new_prims
        gpr = _read_prim_rows(gprim_ref)
        d_new_total = jax.tree_util.tree_map(
            jnp.add, d_newprims_acc, gpr
        )
        d_prims_fk, d_theta_fk = vjp_fk(d_new_total)
        d_prims_total = jax.tree_util.tree_map(jnp.add, d_prims_acc, d_prims_fk)
        d_theta_total = jax.tree_util.tree_map(jnp.add, d_theta_acc, d_theta_fk)

        for ip in range(n_prim):
            p, q = d_prims_total[ip]
            row = _row7(list(p) + list(q))
            dprimc_ref[0, ip] = jnp.pad(row, ((0, 0), (0, TRAJ_COLS - 7)))
            dv, dw, ds_, dfric, dsoft = d_theta_total[ip]
            row = jnp.concatenate(
                [jnp.zeros((1, 7), jnp.float32)]
                + [s.reshape(1, 1) for s in list(dv) + list(dw) + list(ds_)]
                + [dfric.reshape(1, 1), dsoft.reshape(1, 1)],
                axis=1,
            )  # (1, 18)
            dptheta_ref[0, ip] = jnp.pad(row, ((0, 0), (0, PRIM_COLS - 18)))
        dscal_ref[0] = jnp.pad(d_gf_acc.reshape(1, 1), ((0, 0), (0, 7)))

    # ---------------- pallas_call plumbing ---------------- #

    _params = pltpu.CompilerParams(vmem_limit_bytes=126 * 2**20)

    def _spec(shape):
        n = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * n, memory_space=pltpu.VMEM
        )

    state_spec = _spec((N_COMP, NC, PC))
    mat_spec = _spec((3, NC, PC))
    scal_spec = _spec((1, 8))
    prim_spec = _spec((n_prim, 1, PRIM_COLS))
    traj_spec = _spec((n_prim, steps + 1, TRAJ_COLS))
    prow_spec = _spec((n_prim, 1, TRAJ_COLS))
    hist_spec = _spec((N_CKPT, N_COMP, NC, PC))
    hist_prim_spec = _spec((N_CKPT, n_prim, 1, TRAJ_COLS))
    const_spec = _spec((5, NC, PC))
    in_specs = [state_spec, mat_spec, scal_spec, prim_spec, const_spec]

    _fwd_scratch = [
        pltpu.VMEM((N_COMP, NC, PC), jnp.float32),  # ps
        pltpu.VMEM((9, NC, PC), jnp.float32),  # aff
        pltpu.VMEM((4, rx, ryrz), jnp.float32),  # grid
    ]

    graw_spec = _spec((steps, 4, rx, ryrz))

    def fwd_call(inputs):
        B = inputs[0].shape[0]
        out_specs = [state_spec, traj_spec, hist_spec, hist_prim_spec]
        out_shape = [
            jax.ShapeDtypeStruct((B, N_COMP, NC, PC), jnp.float32),
            jax.ShapeDtypeStruct((B, n_prim, steps + 1, TRAJ_COLS), jnp.float32),
            jax.ShapeDtypeStruct((B, N_CKPT, N_COMP, NC, PC), jnp.float32),
            jax.ShapeDtypeStruct(
                (B, N_CKPT, n_prim, 1, TRAJ_COLS), jnp.float32
            ),
        ]
        if STORE_GRAW:
            out_specs.append(graw_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((B, steps, 4, rx, ryrz), jnp.float32)
            )
        return pl.pallas_call(
            fwd_kernel,
            grid=(B,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=_fwd_scratch,
            interpret=interpret,
            compiler_params=_params,
        )(*inputs)

    def seg_hist_call(start_state, start_prim, inputs, L):
        B = start_state.shape[0]
        return pl.pallas_call(
            _make_seg_kernel(L),
            grid=(B,),
            in_specs=[state_spec, prow_spec, mat_spec, scal_spec, prim_spec,
                      const_spec],
            out_specs=[_spec((L, N_COMP, NC, PC)),
                       _spec((L, n_prim, 1, TRAJ_COLS))],
            out_shape=[
                jax.ShapeDtypeStruct((B, L, N_COMP, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct((B, L, n_prim, 1, TRAJ_COLS), jnp.float32),
            ],
            scratch_shapes=_fwd_scratch,
            interpret=interpret,
            compiler_params=_params,
        )(start_state, start_prim, inputs[1], inputs[2], inputs[3], inputs[4])

    def bwd_step_call(saved, saved_prim, inputs, g_state, g_prim,
                      saved_graw=None):
        B = saved.shape[0]
        extra_in = [_spec((4, rx, ryrz))] if STORE_GRAW else []
        extra_args = [saved_graw] if STORE_GRAW else []
        return pl.pallas_call(
            bwd_step_kernel,
            grid=(B,),
            in_specs=[state_spec, prow_spec, mat_spec, scal_spec, prim_spec,
                      const_spec, state_spec, prow_spec] + extra_in,
            out_specs=[state_spec, prow_spec, mat_spec, scal_spec, prim_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, N_COMP, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct((B, n_prim, 1, TRAJ_COLS), jnp.float32),
                jax.ShapeDtypeStruct((B, 3, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
                jax.ShapeDtypeStruct((B, n_prim, 1, PRIM_COLS), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((9, NC, PC), jnp.float32),  # aff / d_affine
                pltpu.VMEM((4, rx, ryrz), jnp.float32),  # raw grid
                pltpu.VMEM((3, rx, ryrz), jnp.float32),  # post-op grid
                pltpu.VMEM((3, rx, ryrz), jnp.float32),  # d_gpost / d_graw
                pltpu.VMEM((1, rx, ryrz), jnp.float32),  # d_gm
            ],
            interpret=interpret,
            compiler_params=_params,
        )(saved, saved_prim, inputs[1], inputs[2], inputs[3], inputs[4],
          g_state, g_prim, *extra_args)

    @jax.custom_vjp
    def _core(inputs):
        out = fwd_call(list(inputs))
        return (out[0], out[1])

    def _core_fwd(inputs):
        out = fwd_call(list(inputs))
        graw = out[4] if STORE_GRAW else None
        return (out[0], out[1]), (inputs, out[2], out[3], graw)

    def _core_bwd(res, g):
        inputs, hist, hist_prim, graw = res
        g_state_out, g_traj = g
        gtraj_rows = jnp.moveaxis(g_traj, 2, 0)[:, :, :, None, :]

        def body(acc, xs):
            g_state, g_prim, g_mat, g_scal, g_ptheta = acc
            if STORE_GRAW:
                saved, saved_prim, gtraj_row, saved_graw = xs
            else:
                saved, saved_prim, gtraj_row = xs
                saved_graw = None
            d_state, d_primc, d_mat, d_scal, d_ptheta = bwd_step_call(
                saved, saved_prim, inputs, g_state, g_prim + gtraj_row,
                saved_graw,
            )
            return (
                d_state, d_primc, g_mat + d_mat, g_scal + d_scal,
                g_ptheta + d_ptheta,
            ), None

        acc = (
            g_state_out,
            gtraj_rows[0],  # copy_frame: traj[0] <- final carry
            jnp.zeros_like(inputs[1]),
            jnp.zeros_like(inputs[2]),
            jnp.zeros_like(inputs[3]),
        )
        if CKPT_K == 1:
            hist_t = jnp.moveaxis(hist, 1, 0)
            hist_prim_t = jnp.moveaxis(hist_prim, 1, 0)
            xs = (hist_t[::-1], hist_prim_t[::-1], gtraj_rows[1:][::-1])
            if STORE_GRAW:
                xs = xs + (jnp.moveaxis(graw, 1, 0)[::-1],)
            acc, _ = jax.lax.scan(body, acc, xs)
        else:
            for s in reversed(range(N_CKPT)):
                L = min(CKPT_K, steps - s * CKPT_K)
                seg_hist, seg_prim = seg_hist_call(
                    hist[:, s], hist_prim[:, s], inputs, L
                )
                lo = s * CKPT_K
                xs = (
                    jnp.moveaxis(seg_hist, 1, 0)[::-1],
                    jnp.moveaxis(seg_prim, 1, 0)[::-1],
                    gtraj_rows[lo + 1 : lo + L + 1][::-1],
                )
                acc, _ = jax.lax.scan(body, acc, xs)
        d_state, d_primc, d_mat, d_scal, d_ptheta = acc
        d_prim = d_ptheta.at[:, :, :, 0:7].add(d_primc[:, :, :, 0:7])
        return ((d_state, d_mat, d_scal, d_prim, jnp.zeros_like(inputs[4])),)

    _core.defvjp(_core_fwd, _core_bwd)

    # ---------------- pack / unpack with x sort (XLA side) ---------------- #

    def _sort_order(x):
        """(B, P, 3) -> (order, inv) (B, P) int32, stable sort by
        (x cell, y cell) lexicographic so each 128-particle chunk is
        coherent in both windowed dims. Measured spreads under this sort on
        a pour_soup rollout: x <= 5, y <= 9 cells per chunk group
        (runs/r5/window_diag_pour_soup.json) vs usable extents WX-3-7 and
        WY-3."""
        xcell = jnp.floor(x[..., 0] * inv_dx).astype(jnp.int32)
        ycell = jnp.floor(x[..., 1] * inv_dx).astype(jnp.int32)
        key = xcell * n_grid + jnp.clip(ycell, 0, n_grid - 1)
        order = jnp.argsort(key, axis=1, stable=True)
        inv = jnp.argsort(order, axis=1, stable=True)
        return order, inv

    _takeB = jax.vmap(lambda t, o: t[o])

    def _pack(state, action):
        B = state.x.shape[0]
        order, inv = _sort_order(state.x)

        def padp(t):  # (B, P) -> (B, NC, PC)
            return jnp.pad(t, ((0, 0), (0, PPAD - P))).reshape(B, NC, PC)

        xs = _takeB(state.x, order)
        vs = _takeB(state.v, order)
        Cs = _takeB(state.C, order)
        Fs = _takeB(state.F, order)
        Js = _takeB(state.J, order)
        comps = [padp(xs[..., i]) for i in range(3)]
        comps += [padp(vs[..., i]) for i in range(3)]
        comps += [padp(Cs[..., i, j]) for i in range(3) for j in range(3)]
        comps += [padp(Fs[..., i, j]) for i in range(3) for j in range(3)]
        comps += [padp(Js)]
        state_pk = jnp.stack(comps, axis=1)

        def bcast_sorted(t):  # (B, 1) or (B, P) -> sorted (B, NC, PC)
            t = jnp.broadcast_to(t, (B, P))
            return padp(_takeB(t, order))

        mat_pk = jnp.stack(
            [bcast_sorted(state.mu), bcast_sorted(state.lamda),
             bcast_sorted(state.yield_stress)],
            axis=1,
        )
        scal = jnp.pad(state.friction.reshape(B, 1), ((0, 0), (0, 7)))[:, None, :]

        # static per-particle attributes, permuted per env; valid marks the
        # padding tail (stays at the end: only the first P slots are real)
        cb = jnp.broadcast_to(CONSTS_BASE[None], (B, 5, P))
        cb = jax.vmap(lambda t, o: t[:, o])(cb, order)
        consts_pk = jnp.pad(cb, ((0, 0), (0, 0), (0, PPAD - P))).reshape(
            B, 5, NC, PC
        )

        prows = []
        for ip in range(n_prim):
            pr = state.primitives[ip]
            row = jnp.concatenate(
                [
                    pr.position[:, 0],
                    pr.rotation[:, 0],
                    pr.v[:, 0],
                    pr.w[:, 0],
                    pr.size,
                    pr.friction.reshape(B, 1),
                    pr.softness.reshape(B, 1),
                ],
                axis=1,
            )  # (B, 18)
            prows.append(jnp.pad(row, ((0, 0), (0, PRIM_COLS - 18))))
        prim_pk = jnp.stack(prows, axis=1)[:, :, None, :]
        return (state_pk, mat_pk, scal, prim_pk, consts_pk), inv

    def _unpack(state, state_pk, traj, inv):
        B = state_pk.shape[0]

        def unp(idx):  # (B, NC, PC) -> (B, P), back in original order
            return _takeB(state_pk[:, idx].reshape(B, PPAD)[:, :P], inv)

        x = jnp.stack([unp(_IX + i) for i in range(3)], axis=-1)
        v = jnp.stack([unp(_IV + i) for i in range(3)], axis=-1)
        C = jnp.stack(
            [
                jnp.stack([unp(_IC + 3 * i + j) for j in range(3)], axis=-1)
                for i in range(3)
            ],
            axis=-2,
        )
        F = jnp.stack(
            [
                jnp.stack([unp(_IF + 3 * i + j) for j in range(3)], axis=-1)
                for i in range(3)
            ],
            axis=-2,
        )
        J = unp(_IJ)
        prims = []
        for ip in range(n_prim):
            pr = state.primitives[ip]
            prims.append(
                pr._replace(
                    position=traj[:, ip, :, 0:3],
                    rotation=traj[:, ip, :, 3:7],
                )
            )
        return state._replace(x=x, v=v, C=C, F=F, J=J, primitives=tuple(prims))

    def step_batch(state, action=None):
        """Drop-in for the vmapped oracle step: state batched, primitive v/w
        buffers already set (set_action runs in the engine wrapper)."""
        inputs, inv = _pack(state, action)
        state_pk, traj = _core(inputs)
        nstate = _unpack(state, state_pk, traj, inv)
        return nstate, nstate

    def coverage_report(state):
        """Max per-chunk x/y cell spreads for ``state`` under the kernel's
        own sort vs the windows' usable extents. Support outside a window
        is dropped (mirroring the reference's OOB scatter drop), so
        ``ok`` False means the config's windows are too narrow for this
        state — a silent-physics-error guard for benches and tests."""
        order, _ = _sort_order(state.x)
        xs = _takeB(state.x[..., 0], order)
        ys = _takeB(state.x[..., 1], order)

        def cells(t):
            c = jnp.floor(t * inv_dx - 0.5).astype(jnp.int32)
            Bn = t.shape[0]
            pad = jnp.pad(c, ((0, 0), (0, PPAD - P)), constant_values=10**6)
            return pad.reshape(Bn, NC, PC)

        cx, cy = cells(xs), cells(ys)
        valid = jnp.pad(
            jnp.ones((cx.shape[0], P), bool), ((0, 0), (0, PPAD - P))
        ).reshape(cx.shape)
        big = 10**6
        spread = lambda c: (
            jnp.max(jnp.where(valid, c, -big), axis=-1)
            - jnp.min(jnp.where(valid, c, big), axis=-1)
        ).max()
        sx = spread(cx)
        sy = spread(cy)
        usable_x = (WX - 3 - 7) if not DENSE_X else 10**6
        align_y = 128 // math.gcd(rz, 128)
        usable_y = (WY - 3 - (align_y - 1)) if USE_YW else 10**6
        return {
            "x_spread": int(sx), "x_usable": usable_x,
            "y_spread": int(sy), "y_usable": usable_y,
            "ok": bool((int(sx) <= usable_x) and (int(sy) <= usable_y)),
        }

    step_batch._core = _core
    step_batch._pack = _pack
    step_batch.coverage_report = coverage_report
    # Transfer-matmul FLOPs per env per macro call (P2G M=4*WX + G2P
    # M=3*WX against the shared (3PC, NW) rhs, per chunk per substep) —
    # the dominant cost term. Consumers estimate wall time with the
    # measured effective rate (see engine/mpm.py est_grad_seconds_per_call
    # and the axon execution-length guard in algorithms/apg.py).
    step_batch.est_fwd_flops_per_env_call = float(
        steps * NC * 2 * (4 * WX + 3 * WX) * (3 * PC) * NW
    )
    return step_batch
