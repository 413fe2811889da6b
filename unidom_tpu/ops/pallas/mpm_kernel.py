"""Fused Pallas TPU kernel: one full MPM macro step (``conf.steps``
substeps) per kernel program, grid and particle state resident in VMEM.

Why: the XLA MPM path round-trips the (res, 3) grid and every transfer
intermediate through HBM for each of the ~dozens of small ops per substep;
at whip_rope scale (P=67, 32^3 grid, 70 substeps/action) the training step
is entirely HBM/dispatch bound (~0.1% FLOP utilization). This kernel loads
one env's particle state once, runs all substeps with the grid living in
VMEM, and writes the result once — the only HBM traffic is the state at the
macro-step boundary.

Design (one env per grid program):
- Particle state is SoA: 25 components (x 3, v 3, C 9, F 9, J 1) packed as
  a (25, NC, 128) block, NC = ceil(P / 128); all 3x3 math runs in component
  form (ops/m3.py), including the in-kernel Jacobi SVD (ops/svd3.svd3_soa).
- Transfers use the dense tensor-product form (engine/mpm.py
  _p2g_dense/_g2p_dense semantics) with the per-axis B-spline bases built
  *directly in matmul layout* from broadcasted iota — the x-basis as
  (rx, 128) per 128-particle chunk, the (y, z) pair evaluated on the
  flattened (128, ry*rz) plane — so P2G/G2P are plain MXU matmuls with no
  reshapes/transposes of large arrays, and the (P, plane) intermediates
  that dominate the XLA path's HBM traffic never leave VMEM.
- Rigid primitives: the substep carries the current position/rotation as
  scalars and advances them with the same clipped-FK recursion
  (engine/primitives.py forward_kinematics); SDF collision / position
  control / ground friction / boundary conditions are evaluated on
  (rx, ry*rz) component planes. Normals are exact autodiff normals of the
  SDF, matching ops/sdf.sdf_normal.
- Backward kernel recomputes the forward, checkpointing each substep's
  carry into VMEM scratch, then walks the substeps in reverse taking
  ``jax.vjp`` of the same substep math — the exact adjoint of the oracle
  (engine/mpm.py _substep), no hand-derived gradients. The macro-level
  gradient ops (scrub_mpm_state / clamp_grad_norm_tree) stay outside, as
  they do on the XLA path.

Reference semantics: DaXBench/daxbench/core/engine/mpm_simulator.py:178-330
(p2g/grid/g2p, materials), primitives.py:154-239 (collide/position
control), GenORM plb mpm_simulator.py:134-150 (von-Mises); this kernel
mirrors the repo's jnp oracle operator-for-operator and is tested against
it (tests/test_pallas_mpm.py).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unidom_tpu.ops import m3
from unidom_tpu.ops.svd3 import svd3_soa

PC_MAX = 128  # particle chunk cap (lane width)

# component indices in the packed particle block
_IX, _IV, _IC, _IF, _IJ = 0, 3, 6, 15, 24
N_COMP = 25
PRIM_COLS = 24  # pos3 rot4 vstep3 wstep3 size3 fric1 soft1 (padded)
TRAJ_COLS = 16  # pos3 rot4 (padded)


def _spline(t):
    """Quadratic B-spline weight, matching engine/mpm.py _axis_basis.
    Comparisons run in f32: Mosaic has no cmpf lowering for packed bf16
    vectors (runs/r4/bench_bf16_mpm.log, arith.cmpf on 8x128x2xbf16)."""
    at = jnp.abs(t)
    atc = at if at.dtype == jnp.float32 else at.astype(jnp.float32)
    return jnp.where(
        atc < 0.5, 0.75 - t * t,
        jnp.where(atc < 1.5, 0.5 * (1.5 - at) ** 2, 0.0),
    )


# ---------------- scalar (per-env) quaternion helpers ---------------- #
# quaternions are 4-tuples of (1, 1) arrays, [w, x, y, z] (ops/quat.py)


def _qmul(q, r):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = r
    out = (
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    )
    norm = jnp.sqrt(sum(c * c for c in out))
    norm = jnp.clip(norm, 1e-12, jnp.inf)
    return tuple(c / norm for c in out)


def _w2quat(v):
    w = jnp.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2) + 1e-12
    s = jnp.sin(w / 2.0) / w
    return (jnp.cos(w / 2.0), v[0] * s, v[1] * s, v[2] * s)


def _qinv(q):
    conj = (q[0], -q[1], -q[2], -q[3])
    norm = jnp.sqrt(sum(c * c for c in conj)) + 1e-12
    return tuple(c / norm for c in conj)


def _qrot(q, v):
    """Rotate component vectors v (3-tuple of planes) by scalar quat q."""
    qv = (q[1], q[2], q[3])
    uv = m3.cross3(qv, v)
    uuv = m3.cross3(qv, uv)
    return tuple(v[i] + 2.0 * (q[0] * uv[i] + uuv[i]) for i in range(3))


# ---------------- SoA SDFs (component-plane inputs) ---------------- #


def _sdf_box_soa(size, p):
    """ops/sdf.sdf_box on component planes; size: 3-tuple of (1,1)."""
    q = tuple(jnp.abs(p[i]) - size[i] for i in range(3))
    qc = tuple(jnp.clip(c, 0.0, jnp.inf) for c in q)
    out = jnp.sqrt(qc[0] ** 2 + qc[1] ** 2 + qc[2] ** 2 + 1e-12)
    inner = jnp.clip(jnp.maximum(jnp.maximum(q[0], q[1]), q[2]), -jnp.inf, 0.0)
    return out + inner


def _sdf_container_soa(size, p):
    """ops/sdf.sdf_container (cut hollow sphere / open bowl) on component
    planes; size = (radius, cut height, thickness) as (1,1) scalars."""
    r, h, t = size[0], size[1], size[2]
    w = jnp.sqrt(jnp.clip(r * r - h * h, 1e-12, None))
    qx = jnp.sqrt(p[0] ** 2 + p[2] ** 2 + 1e-12)
    qy = p[1]
    rim = jnp.sqrt((qx - w) ** 2 + (qy - h) ** 2 + 1e-12) - t
    shell = jnp.abs(jnp.sqrt(qx * qx + qy * qy + 1e-12) - r) - t
    return jnp.where(h * qx < w * qy, rim, shell)


_SOA_SDFS = {"box": _sdf_box_soa, "container": _sdf_container_soa}


def _sdf_normal_soa(sdf, size, p):
    """Exact autodiff normal (ops/sdf.sdf_normal semantics), elementwise."""
    g = jax.grad(lambda pt: jnp.sum(sdf(size, pt)))(p)
    n = jnp.sqrt(g[0] ** 2 + g[1] ** 2 + g[2] ** 2 + 1e-12)
    return tuple(c / n for c in g)


# Budget for one resident history block (the per-segment recompute history
# and the strided checkpoint history are each one of these). 4 MB leaves
# room beside the grid planes + transfer transients in 16 MB VMEM.
_HIST_BUDGET = 4 * 2**20


def _chunking(n_particles):
    pc = min(PC_MAX, -(-n_particles // 8) * 8)
    nc = -(-n_particles // pc)
    return pc, nc


def _ckpt_stride(steps, nc, pc):
    """Checkpoint every K substeps so that both the strided checkpoint
    history (ceil(steps/K) entries) and the per-segment recompute history
    (K entries) fit the VMEM budget. Returns K (1 = checkpoint every
    substep, the exact-history fast path). When segmentation is needed,
    K ~ sqrt(steps): the backward's per-segment recompute kernels and
    reverse scans are unrolled in Python over ceil(steps/K) segments, so
    minimizing K explodes graph size / compile time while maximizing K
    blows the segment history — the sqrt split balances both."""
    blk = N_COMP * nc * pc * 4
    max_entries = max(_HIST_BUDGET // blk, 1)
    if steps <= max_entries:
        return 1
    k = int(math.ceil(math.sqrt(steps)))
    # stay within the budget on both sides
    return min(max(k, int(-(-steps // max_entries))), max_entries)


def mpm_kernel_supported(sim):
    """Whether the fused kernel covers this simulator's configuration."""
    conf = sim.conf
    rx, ry, rz = conf.res
    cells = rx * ry * rz
    if cells * 4 * 8 > 6 * 2**20:  # grid planes + transfer transients in VMEM
        return False
    if any(name not in _SOA_SDFS for name in sim.sdf_names):
        return False
    if sim.n_particles > 4096:
        return False
    # segmented backward: segment length K and ceil(steps/K) checkpoints
    # must each fit the history budget
    pc, nc = _chunking(sim.n_particles)
    blk = N_COMP * nc * pc * 4
    k = _ckpt_stride(conf.steps, nc, pc)
    if k * blk > _HIST_BUDGET or -(-conf.steps // k) * blk > _HIST_BUDGET:
        return False
    return True


def build_mpm_step_kernel(sim, interpret=False, dtype=jnp.float32):
    """Build step_batch(state, action) -> (state, state) backed by the fused
    kernel with a custom VJP. ``sim`` is a finalized MPMSimulator.

    ``dtype=jnp.bfloat16`` is the round-4 mixed-precision probe (the trace
    shows the kernel VPU-bound with transfer matmuls at 16.7% MXU,
    docs/BENCHMARKS.md): basis planes, transfer matmul operands, and grid
    ops run in bf16 (2x VPU lane packing, 2x MXU rate); particle state,
    stress math, and matmul accumulation stay f32. Measured by
    scripts/r4_bf16_probe.py."""
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
    # chunk width: multiple of 8 sublanes, capped at 128 — smaller chunks
    # for small P shrink the dominant (PC, ryrz) basis planes
    PC, NC = _chunking(P)
    PPAD = NC * PC

    # segmented backward (sqrt-style remat): the forward checkpoints every
    # CKPT_K-th substep input; the backward recomputes each segment's
    # per-substep history with a short forward kernel before the reverse
    # walk. CKPT_K == 1 keeps the original exact-history path.
    CKPT_K = _ckpt_stride(steps, NC, PC)
    N_CKPT = -(-steps // CKPT_K)

    mat = np.asarray(sim.material)
    consts_np = np.zeros((5, NC, PC), np.float32)
    consts_np.reshape(5, -1)[0, :P] = 1.0  # valid
    consts_np.reshape(5, -1)[1, :P] = np.clip(np.asarray(sim.h), 0.1, 5.0)
    consts_np.reshape(5, -1)[2, :P] = (mat == 0).astype(np.float32)  # water
    consts_np.reshape(5, -1)[3, :P] = (mat == 2).astype(np.float32)  # clip
    consts_np.reshape(5, -1)[4, :P] = (mat == 3).astype(np.float32)  # vm
    CONSTS_IN = jnp.asarray(consts_np)

    # ---------------- transfers (one 128-particle chunk) ---------------- #

    def _x_basis(xd_row):
        """xd_row: (1, PC) scaled x coordinate. Returns (w, wd): (rx, PC)
        with w[i, p] the node-i weight and wd = w * (i - xd)."""
        i = jax.lax.broadcasted_iota(jnp.int32, (rx, PC), 0)  # f32 iota is
        t = (i.astype(jnp.float32) - xd_row).astype(dtype)  # not a legal tpu.iota result
        w = _spline(t)
        return w, w * t

    def _plane_bases(yd_col, zd_col):
        """yd/zd: (PC, 1) scaled coords. Returns byc, byc_yd, byc_zd:
        (PC, ryrz) products of the y/z bases on the flattened plane."""
        jk = jax.lax.broadcasted_iota(jnp.int32, (PC, ryrz), 1)
        ty = ((jk // rz).astype(jnp.float32) - yd_col).astype(dtype)
        tz = ((jk % rz).astype(jnp.float32) - zd_col).astype(dtype)
        wy = _spline(ty)
        wz = _spline(tz)
        return wy * wz, (wy * ty) * wz, wy * (wz * tz)

    def _chunk(arr, c):
        return arr[c : c + 1, :]  # (1, PC) row of an (NC, PC) component

    def _col(row):
        return jnp.transpose(row)  # (1, PC) -> (PC, 1)

    def _mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def _mm_t(a, b):
        # contract the trailing axis of both: (rx, ryrz) x (PC, ryrz) -> (rx, PC)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def _bases(x, valid, c):
        """Per-chunk bases, shared between P2G and G2P (positions do not
        change in between; recomputing them doubles the dominant
        plane-op count and overflows the LLO register allocator)."""
        vmask = _chunk(valid, c).astype(dtype)
        wx, wxd = _x_basis(_chunk(x[0], c) * inv_dx)
        wx = wx * vmask
        wxd = wxd * vmask
        byc, byc_yd, byc_zd = _plane_bases(
            _col(_chunk(x[1], c)) * inv_dx, _col(_chunk(x[2], c)) * inv_dx
        )
        return wx, wxd, byc, byc_yd, byc_zd

    # Stacked transfers (round-4 MXU-utilization rework): the original
    # per-chunk form issued 19 matmuls per chunk per substep with M=rx
    # (often 32) and K=PC (often 72), filling 14-17% of the 128x128 MXU
    # (docs/BENCHMARKS.md trace table). Instead, stack the three channels
    # (+ the mass row) along M via aligned sublane concats and the three
    # basis planes x NC chunks along K, so:
    #   P2G = ONE (3rx+rx, NC*3PC) @ (NC*3PC, ryrz) matmul  (M = 4rx >= 128)
    #   G2P = ONE (3rx, ryrz) @ (ryrz, NC*3PC) contraction  (K = ryrz, large)
    # The chunk-summed accumulation P2G needs *is* the K contraction, and
    # the shared rhs block is built once per substep for both transfers.

    def _stack_rhs(bases):
        """(NC*3PC, ryrz) sublane-stack [byc; byc_yd; byc_zd] per chunk."""
        return jnp.concatenate(
            [jnp.concatenate([b[2], b[3], b[4]], axis=0) for b in bases],
            axis=0,
        )

    def _p2g(bases, rhs, v, affine):
        """v: 3-tuple of (NC, PC); affine: m3 nested tuple. Returns grid
        velocity planes (3) and mass plane, each (rx, ryrz)."""
        zero = jnp.zeros((rx, PC), dtype)
        blocks = []
        for c in range(NC):
            wx, wxd = bases[c][0], bases[c][1]
            rows = []
            for ch in range(3):
                p0 = wx * (p_mass * _chunk(v[ch], c)) + (
                    dx * _chunk(affine[ch][0], c)
                ) * wxd
                p1 = (dx * _chunk(affine[ch][1], c)) * wx
                p2 = (dx * _chunk(affine[ch][2], c)) * wx
                rows.append(
                    jnp.concatenate(
                        [p0.astype(dtype), p1.astype(dtype), p2.astype(dtype)],
                        axis=1,
                    )
                )
            rows.append(jnp.concatenate([wx * p_mass, zero, zero], axis=1))
            blocks.append(jnp.concatenate(rows, axis=0))  # (4rx, 3PC)
        lhs = jnp.concatenate(blocks, axis=1) if NC > 1 else blocks[0]
        G = _mm(lhs, rhs)  # (4rx, ryrz) f32 accumulation
        return tuple(G[ch * rx : (ch + 1) * rx] for ch in range(3)), G[3 * rx :]

    def _g2p(bases, rhs, g):
        """Adjoint contractions: returns new_v (3-tuple of (NC, PC)) and
        new_C (m3 nested tuple of (NC, PC))."""
        # grid-op scalar products may have promoted g to f32 in bf16 mode
        # (f32 scalars, see _s) — harmonize with the rhs operand dtype
        GG = jnp.concatenate(
            [g[0].astype(dtype), g[1].astype(dtype), g[2].astype(dtype)],
            axis=0,
        )  # (3rx, ryrz)
        M_all = _mm_t(GG, rhs)  # (3rx, NC*3PC) f32
        nv = [[] for _ in range(3)]
        nC = [[[] for _ in range(3)] for _ in range(3)]
        for c in range(NC):
            wx, wxd = bases[c][0], bases[c][1]
            base = c * 3 * PC
            for ch in range(3):
                rows = M_all[ch * rx : (ch + 1) * rx]
                M = rows[:, base : base + PC]
                nv[ch].append(jnp.sum(wx * M, axis=0, keepdims=True))
                nC[ch][0].append(
                    4.0 * inv_dx * jnp.sum(wxd * M, axis=0, keepdims=True)
                )
                M_yd = rows[:, base + PC : base + 2 * PC]
                nC[ch][1].append(
                    4.0 * inv_dx * jnp.sum(wx * M_yd, axis=0, keepdims=True)
                )
                M_zd = rows[:, base + 2 * PC : base + 3 * PC]
                nC[ch][2].append(
                    4.0 * inv_dx * jnp.sum(wx * M_zd, axis=0, keepdims=True)
                )
        new_v = tuple(jnp.concatenate(nv[ch], axis=0) for ch in range(3))
        new_C = tuple(
            tuple(jnp.concatenate(nC[i][j], axis=0) for j in range(3))
            for i in range(3)
        )
        return new_v, new_C

    # ---------------- grid index planes ---------------- #

    def _grid_indices():
        xi = jax.lax.broadcasted_iota(jnp.int32, (rx, ryrz), 0)
        jk = jax.lax.broadcasted_iota(jnp.int32, (rx, ryrz), 1)
        yi = jk // rz
        zi = jk % rz
        return xi, yi, zi

    # ---------------- one substep (pure; carried through fori_loop) ------- #

    # static material specialization: dead sections are not even traced
    has_water = bool((mat == 0).any())
    has_plastic = bool((mat == 2).any())
    has_vm = bool((mat == 3).any())

    def make_substep(consts):
        valid, h, water, plastic_m, vm_m = (consts[i] for i in range(5))
        water_b = water > 0.5
        plastic_b = plastic_m > 0.5
        vm_b = vm_m > 0.5

        def substep(carry, theta):
            x, v, C, F, J, prims = carry
            (mu_raw, la_raw, ys), gf, prim_theta = theta

            # --- deformation gradient update + stress (engine/mpm.py) ---
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

            # --- P2G ---
            bases = [_bases(x, valid, c) for c in range(NC)]
            rhs = _stack_rhs(bases)
            g, gm = _p2g(bases, rhs, v, affine)
            g = tuple(gc.astype(dtype) for gc in g)
            # mass mask compares on the f32 matmul output (no bf16 cmpf)
            mass_mask = gm > 1e-10
            gm = gm.astype(dtype)

            # --- primitive FK (engine/primitives.py forward_kinematics) ---
            new_prims = []
            for ip in range(n_prim):
                p_cur, q_cur = prims[ip]
                vstep, wstep = prim_theta[ip][0], prim_theta[ip][1]
                p_next = tuple(
                    jnp.clip(p_cur[i] + vstep[i], -2.0, 2.0) for i in range(3)
                )
                q_next = _qmul(_w2quat(wstep), q_cur)
                new_prims.append((p_next, q_next))

            # --- grid ops ---
            safe_m = jnp.where(mass_mask, gm, 1.0)
            g = tuple(jnp.where(mass_mask, g[i] / safe_m, g[i]) for i in range(3))
            g = tuple(g[i] + dt * grav[i] for i in range(3))

            xi, yi, zi = _grid_indices()
            gx = (xi.astype(dtype) * dx, yi.astype(dtype) * dx,
                  zi.astype(dtype) * dx)

            # (1, 1)-shaped per-env values broadcast against (rx, ryrz)
            # planes must be rank-0 scalars — Mosaic has no combined
            # sublane+lane broadcast for vectors, but scalars are fine.
            # Scalars stay f32 even in bf16 mode: Mosaic scalar registers
            # are 32-bit and real-TPU compile rejects rank-0 bf16
            # ("Only arrays with 32-bit element types can be converted to
            # scalars", runs/r4/bench_bf16_mpm.log); scalar-plane products
            # promote locally and planes are cast back where it matters.
            def _s(a):
                return a[0, 0]

            for ip in range(n_prim):
                p_cur = tuple(_s(c) for c in prims[ip][0])
                q_cur = tuple(_s(c) for c in prims[ip][1])
                p_next = tuple(_s(c) for c in new_prims[ip][0])
                q_next = tuple(_s(c) for c in new_prims[ip][1])
                vstep_t, wstep_t, size_t, fric_t, soft_t = prim_theta[ip]
                vstep = tuple(_s(c) for c in vstep_t)
                size = tuple(_s(c) for c in size_t)
                fric = _s(fric_t)
                soft = _s(soft_t)
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
                        (nrm < 0).astype(dtype)
                        * (jnp.sqrt(vt_dot) > 1e-12).astype(dtype)
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
            gidx = (xi.astype(dtype), yi.astype(dtype),
                    zi.astype(dtype))
            gf_s = gf[0, 0]  # f32 scalar (see _s)
            lin = g[1] + 1e-30
            vit = (g[0] - gidx[0] * 1e-30,
                   g[1] - lin - gidx[1] * 1e-30,
                   g[2] - gidx[2] * 1e-30)
            lit = jnp.sqrt(
                (vit[0] + 1e-12) ** 2 + (vit[1] + 1e-12) ** 2
                + (vit[2] + 1e-12) ** 2
            )
            coef_f = jnp.clip(1.0 + gf_s * lin / lit, 0.0, jnp.inf)
            gfric = tuple(coef_f * (vit[i] + gidx[i] * 1e-30) for i in range(3))
            gfric = (gfric[0], jnp.zeros_like(gfric[1]), gfric[2])
            fmask = (yi < 3) & (g[1] <= 0)
            g = tuple(jnp.where(fmask, gfric[i], g[i]) for i in range(3))

            # boundary: 3-cell walls, upper bound at n_grid (open when res <
            # n_grid — reference semantics, mpm_simulator.py:310-313)
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

            # --- G2P + advect ---
            new_v, new_C = _g2p(bases, rhs, g)
            new_x = tuple(x[i] + dt * new_v[i] for i in range(3))
            new_J = J * (1.0 + dt * (new_C[0][0] + new_C[1][1] + new_C[2][2]))
            return (new_x, new_v, new_C, Fn, new_J, tuple(new_prims))

        return substep

    # ---------------- ref <-> carry plumbing ---------------- #

    def _read_carry(state_ref):
        x = tuple(state_ref[0, _IX + i] for i in range(3))
        v = tuple(state_ref[0, _IV + i] for i in range(3))
        C = tuple(
            tuple(state_ref[0, _IC + 3 * i + j] for j in range(3))
            for i in range(3)
        )
        F = tuple(
            tuple(state_ref[0, _IF + 3 * i + j] for j in range(3))
            for i in range(3)
        )
        J = state_ref[0, _IJ]
        return x, v, C, F, J

    def _write_state(out_ref, carry):
        x, v, C, F, J, _ = carry
        for i in range(3):
            out_ref[0, _IX + i] = x[i]
            out_ref[0, _IV + i] = v[i]
        for i in range(3):
            for j in range(3):
                out_ref[0, _IC + 3 * i + j] = C[i][j]
                out_ref[0, _IF + 3 * i + j] = F[i][j]
        out_ref[0, _IJ] = J

    def _read_prims(prim_ref):
        prims, theta = [], []
        for ip in range(n_prim):
            row = prim_ref[0, ip]  # (1, PRIM_COLS)
            sc = lambda j: row[:, j : j + 1]
            p = (sc(0), sc(1), sc(2))
            q = (sc(3), sc(4), sc(5), sc(6))
            vstep = (sc(7), sc(8), sc(9))
            wstep = (sc(10), sc(11), sc(12))
            size = (sc(13), sc(14), sc(15))
            prims.append((p, q))
            theta.append((vstep, wstep, size, sc(16), sc(17)))
        return tuple(prims), tuple(theta)

    def _read_theta(mat_ref, scal_ref, prim_theta):
        mats = tuple(mat_ref[0, i] for i in range(3))
        gf = scal_ref[0][:, 0:1]  # (1, 1) ground friction
        return (mats, gf, prim_theta)

    def _traj_row(prim):
        (p, q) = prim
        row = jnp.concatenate(list(p) + list(q), axis=1)  # (1, 7)
        return jnp.pad(row, ((0, 0), (0, TRAJ_COLS - 7)))

    # ------------- forward kernel (checkpoints history to HBM) ------------ #

    def fwd_kernel(state_ref, mat_ref, scal_ref, prim_ref, const_ref,
                   out_ref, traj_ref, hist_ref, hist_prim_ref):
        consts = tuple(const_ref[i] for i in range(5))
        substep = make_substep(consts)
        prims, prim_theta = _read_prims(prim_ref)
        theta = _read_theta(mat_ref, scal_ref, prim_theta)
        x, v, C, F, J = _read_carry(state_ref)
        carry0 = (x, v, C, F, J, prims)

        def _store_ckpt(s, carry):
            x, v, C, F, J, prims = carry
            for i in range(3):
                hist_ref[0, s, _IX + i] = x[i]
                hist_ref[0, s, _IV + i] = v[i]
            for i in range(3):
                for j in range(3):
                    hist_ref[0, s, _IC + 3 * i + j] = C[i][j]
                    hist_ref[0, s, _IF + 3 * i + j] = F[i][j]
            hist_ref[0, s, _IJ] = J
            for ip in range(n_prim):
                hist_prim_ref[0, s, ip] = _traj_row(prims[ip])

        def body(t, carry):
            # checkpoint every CKPT_K-th substep *input* carry — the
            # backward recomputes within segments and re-linearizes each
            # substep around its input
            if CKPT_K == 1:
                _store_ckpt(t, carry)
            else:
                @pl.when(t % CKPT_K == 0)
                def _():
                    _store_ckpt(t // CKPT_K, carry)

            carry = substep(carry, theta)
            for ip in range(n_prim):
                traj_ref[0, ip, pl.ds(t + 1, 1), :] = _traj_row(carry[5][ip])
            return carry

        carry = jax.lax.fori_loop(0, steps, body, carry0)
        _write_state(out_ref, carry)
        for ip in range(n_prim):  # copy_frame: buffer[0] <- buffer[steps]
            traj_ref[0, ip, pl.ds(0, 1), :] = _traj_row(carry[5][ip])

    # ------------- per-substep backward kernel (loop-free) ---------------- #
    # One substep's exact adjoint per call; the reverse walk over substeps
    # is an XLA lax.scan of this kernel. A monolithic in-kernel reverse
    # fori_loop tripped a TPU LLO register-allocator RET_CHECK ("copy for
    # cssa" live-interval past function end) at this body size — keeping
    # the kernel loop-free sidesteps it, and the extra HBM traffic is just
    # the 25-component carry (~100 kB/env/substep).

    def _read_prim_rows(ref):
        """(1, n_prim, 1, TRAJ_COLS) ref -> ((p, q), ...) in (1,1) scalars."""
        out = []
        for ip in range(n_prim):
            row = ref[0, ip]  # (1, TRAJ_COLS)
            p = tuple(row[:, i : i + 1] for i in range(3))
            q = tuple(row[:, 3 + i : 4 + i] for i in range(4))
            out.append((p, q))
        return tuple(out)

    def bwd_step_kernel(saved_ref, saved_prim_ref, mat_ref, scal_ref,
                        prim_ref, const_ref, gstate_ref, gprim_ref,
                        dstate_ref, dprimc_ref, dmat_ref, dscal_ref,
                        dptheta_ref):
        consts = tuple(const_ref[i] for i in range(5))
        substep = make_substep(consts)
        _, prim_theta = _read_prims(prim_ref)
        theta = _read_theta(mat_ref, scal_ref, prim_theta)

        x, v, C, F, J = _read_carry(saved_ref)
        saved = (x, v, C, F, J, _read_prim_rows(saved_prim_ref))

        gx, gv, gC, gF, gJ = _read_carry(gstate_ref)
        g_carry = (gx, gv, gC, gF, gJ, _read_prim_rows(gprim_ref))

        _, vjp = jax.vjp(substep, saved, theta)
        d_carry, d_theta = vjp(g_carry)

        _write_state(dstate_ref, d_carry[:5] + ((),))
        for ip in range(n_prim):
            dprimc_ref[0, ip] = _traj_row(d_carry[5][ip])
        for i in range(3):
            dmat_ref[0, i] = d_theta[0][i]
        dscal_ref[0] = jnp.pad(d_theta[1], ((0, 0), (0, 7)))
        for ip in range(n_prim):
            dv, dw, ds, dfric, dsoft = d_theta[2][ip]
            row = jnp.concatenate(
                [jnp.zeros((1, 7), jnp.float32)]  # pos/rot slots live in dprimc
                + list(dv) + list(dw) + list(ds) + [dfric, dsoft],
                axis=1,
            )  # (1, 18)
            dptheta_ref[0, ip] = jnp.pad(row, ((0, 0), (0, PRIM_COLS - 18)))

    # ---------------- pallas_call plumbing ---------------- #

    # the default scoped-VMEM cap is 16 MB; the backward substep VJP holds
    # per-chunk linearization residuals live across NC chunks (~30 MB at
    # shape_rope scale: NC=5, ryrz=384). v5e has 128 MiB physical VMEM —
    # raise the cap; it is a ceiling, not a reservation, so small configs
    # (whip_rope) are unaffected.
    _params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

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
    const_spec = pl.BlockSpec(
        (5, NC, PC), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [state_spec, mat_spec, scal_spec, prim_spec, const_spec]

    def fwd_call(inputs):
        B = inputs[0].shape[0]
        return pl.pallas_call(
            fwd_kernel,
            grid=(B,),
            in_specs=in_specs,
            out_specs=[state_spec, traj_spec, hist_spec, hist_prim_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, N_COMP, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct((B, n_prim, steps + 1, TRAJ_COLS), jnp.float32),
                jax.ShapeDtypeStruct((B, N_CKPT, N_COMP, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct(
                    (B, N_CKPT, n_prim, 1, TRAJ_COLS), jnp.float32
                ),
            ],
            interpret=interpret,
            compiler_params=_params,
        )(*inputs, CONSTS_IN)

    def bwd_step_call(saved, saved_prim, inputs, g_state, g_prim):
        B = saved.shape[0]
        return pl.pallas_call(
            bwd_step_kernel,
            grid=(B,),
            in_specs=[state_spec, prow_spec, mat_spec, scal_spec, prim_spec,
                      const_spec, state_spec, prow_spec],
            out_specs=[state_spec, prow_spec, mat_spec, scal_spec, prim_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, N_COMP, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct((B, n_prim, 1, TRAJ_COLS), jnp.float32),
                jax.ShapeDtypeStruct((B, 3, NC, PC), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
                jax.ShapeDtypeStruct((B, n_prim, 1, PRIM_COLS), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_params,
        )(saved, saved_prim, inputs[1], inputs[2], inputs[3], CONSTS_IN,
          g_state, g_prim)

    # --------- segment-recompute forward (segmented backward only) --------- #

    def _make_seg_kernel(L):
        """Re-run L substeps from a checkpointed carry, writing each
        substep's input carry — the per-segment history the reverse walk
        consumes. Same body as fwd_kernel minus state/traj outputs."""

        def seg_kernel(start_ref, startprim_ref, mat_ref, scal_ref, prim_ref,
                       const_ref, shist_ref, shist_prim_ref):
            consts = tuple(const_ref[i] for i in range(5))
            substep = make_substep(consts)
            _, prim_theta = _read_prims(prim_ref)
            theta = _read_theta(mat_ref, scal_ref, prim_theta)
            x, v, C, F, J = _read_carry(start_ref)
            carry0 = (x, v, C, F, J, _read_prim_rows(startprim_ref))

            def body(t, carry):
                x, v, C, F, J, prims = carry
                for i in range(3):
                    shist_ref[0, t, _IX + i] = x[i]
                    shist_ref[0, t, _IV + i] = v[i]
                for i in range(3):
                    for j in range(3):
                        shist_ref[0, t, _IC + 3 * i + j] = C[i][j]
                        shist_ref[0, t, _IF + 3 * i + j] = F[i][j]
                shist_ref[0, t, _IJ] = J
                for ip in range(n_prim):
                    shist_prim_ref[0, t, ip] = _traj_row(prims[ip])
                return substep(carry, theta)

            jax.lax.fori_loop(0, L, body, carry0)

        return seg_kernel

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
            interpret=interpret,
            compiler_params=_params,
        )(start_state, start_prim, inputs[1], inputs[2], inputs[3], CONSTS_IN)

    @jax.custom_vjp
    def _core(inputs):
        out = fwd_call(list(inputs))
        return (out[0], out[1])

    def _core_fwd(inputs):
        out = fwd_call(list(inputs))
        return (out[0], out[1]), (inputs, out[2], out[3])

    def _core_bwd(res, g):
        inputs, hist, hist_prim = res
        g_state_out, g_traj = g

        # traj rows in prow layout: (steps + 1, B, n_prim, 1, TRAJ_COLS);
        # row t+1 was written from substep t's output, row 0 by copy_frame
        gtraj_rows = jnp.moveaxis(g_traj, 2, 0)[:, :, :, None, :]

        def body(acc, xs):
            g_state, g_prim, g_mat, g_scal, g_ptheta = acc
            saved, saved_prim, gtraj_row = xs
            d_state, d_primc, d_mat, d_scal, d_ptheta = bwd_step_call(
                saved, saved_prim, inputs, g_state, g_prim + gtraj_row
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
            # exact history: one reverse scan over all substeps
            hist_t = jnp.moveaxis(hist, 1, 0)  # (steps, B, N_COMP, NC, PC)
            hist_prim_t = jnp.moveaxis(hist_prim, 1, 0)
            xs = (hist_t[::-1], hist_prim_t[::-1], gtraj_rows[1:][::-1])
            acc, _ = jax.lax.scan(body, acc, xs)
        else:
            # segmented: recompute each segment's per-substep history from
            # its checkpoint, then reverse-walk it (newest segment first)
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
        # initial-carry prim cotangent (pos/rot) into the PRIM_COLS layout
        d_prim = d_ptheta.at[:, :, :, 0:7].add(d_primc[:, :, :, 0:7])
        return ((d_state, d_mat, d_scal, d_prim),)

    _core.defvjp(_core_fwd, _core_bwd)

    # ---------------- pack / unpack (XLA side) ---------------- #

    def _pack(state, action):
        B = state.x.shape[0]

        def padp(t):  # (B, P) -> (B, NC, PC)
            return jnp.pad(t, ((0, 0), (0, PPAD - P))).reshape(B, NC, PC)

        comps = [padp(state.x[..., i]) for i in range(3)]
        comps += [padp(state.v[..., i]) for i in range(3)]
        comps += [padp(state.C[..., i, j]) for i in range(3) for j in range(3)]
        comps += [padp(state.F[..., i, j]) for i in range(3) for j in range(3)]
        comps += [padp(state.J)]
        state_pk = jnp.stack(comps, axis=1)

        def bcast(t):  # (B, 1) or (B, P) material field -> (B, NC, PC)
            return padp(jnp.broadcast_to(t, (B, P)))

        mat_pk = jnp.stack(
            [bcast(state.mu), bcast(state.lamda), bcast(state.yield_stress)],
            axis=1,
        )
        scal = jnp.pad(state.friction.reshape(B, 1), ((0, 0), (0, 7)))[:, None, :]

        prows = []
        for ip in range(n_prim):
            pr = state.primitives[ip]
            row = jnp.concatenate(
                [
                    pr.position[:, 0],  # (B, 3)
                    pr.rotation[:, 0],  # (B, 4)
                    pr.v[:, 0],  # (B, 3) uniform per-substep velocity
                    pr.w[:, 0],  # (B, 3)
                    pr.size,  # (B, 3)
                    pr.friction.reshape(B, 1),
                    pr.softness.reshape(B, 1),
                ],
                axis=1,
            )  # (B, 18)
            prows.append(jnp.pad(row, ((0, 0), (0, PRIM_COLS - 18))))
        prim_pk = jnp.stack(prows, axis=1)[:, :, None, :]
        return (state_pk, mat_pk, scal, prim_pk)

    def _unpack(state, state_pk, traj):
        B = state_pk.shape[0]

        def unp(idx):  # (B, NC, PC) -> (B, P)
            return state_pk[:, idx].reshape(B, PPAD)[:, :P]

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
        """Drop-in for the vmapped oracle step: state is batched, the
        primitive v/w buffers must already be set (set_action runs outside,
        in MPMSimulator._build_step)."""
        inputs = _pack(state, action)
        state_pk, traj = _core(inputs)
        nstate = _unpack(state, state_pk, traj)
        return nstate, nstate

    step_batch._core = _core
    step_batch._pack = _pack
    return step_batch
