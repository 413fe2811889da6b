"""Fused Pallas TPU kernel: one full cloth robot step (50 substeps) per
kernel invocation, state resident in VMEM throughout.

Why: the XLA path re-materializes the (B, H, W, 3) state through HBM every
substep — ~50x more HBM traffic than the state size. This kernel loads a
block of envs once, runs all ``n_substeps`` in VMEM, and writes the result
once. The backward kernel recomputes the forward (storing per-substep
states in VMEM scratch) and then walks the substeps in reverse, obtaining
each substep's exact adjoint — including the reference's per-substep
cotangent renormalization (normalize_grad) — by tracing ``jax.vjp`` of the
same substep math inside the kernel body. No hand-derived adjoint, no
semantic drift from the jnp oracle (engine/cloth.py _substep, itself
matching DaXBench cloth_simulator.py:257-337).

Layout: SoA per coordinate, (BLOCK_ENVS, H*W) with envs on sublanes and the
flattened cloth on lanes; the 8 spring neighbors are lane rotations whose
wrap-around junk is killed by the same validity mask that already encodes
the reference's grid-clip semantics.

Restrictions (fall back to the jnp path otherwise): default identity
``collision_func``; checked by the simulator when enabling the kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ENVS = 8  # f32 sublane tile; also bounds backward residual VMEM


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _roll_lanes(x, shift):
    """Circular shift along the lane (HW) axis, with the exact adjoint
    (pltpu.roll has no built-in differentiation rule; the transpose of a
    circular shift is the opposite shift)."""
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _roll_fwd(x, shift):
    return _roll_lanes(x, shift), ()


def _roll_bwd(shift, _, g):
    return (pltpu.roll(g, (-shift) % g.shape[1], axis=1),)


_roll_lanes.defvjp(_roll_fwd, _roll_bwd)


def build_cloth_robot_step_kernel(sim, interpret=False, dtype=jnp.float32):
    """Build robot_step(state, action) -> (state, state) backed by Pallas
    kernels with a custom VJP. ``sim`` is a ClothSimulator (dense layout).
    ``interpret=True`` runs the kernels in the Pallas interpreter (CPU CI).

    ``dtype=jnp.bfloat16`` is the round-4 throughput probe (the kernel is
    VPU-bound at f32 speed-of-light, docs/BENCHMARKS.md): state and substep
    math run in bf16 on 16-sublane blocks (2x VPU lane packing), constants
    are prepared in f32 then cast, outputs cast back to f32 at the state
    boundary. Numerical caveat measured by scripts/r4_bf16_probe.py: the
    spring coefficient stiff*(1/rest - 1/cur) cancels ~80-scale terms,
    which bf16's 8-bit mantissa resolves poorly."""
    conf = sim.conf
    block_envs = BLOCK_ENVS if dtype == jnp.float32 else 2 * BLOCK_ENVS
    H, W = sim.H, sim.W
    HW = H * W
    n_sub = conf.n_substeps
    dt = conf.dt
    gravity = conf.gravity
    damping = float(np.exp(-conf.damping * conf.dt))
    small = conf.small_num
    max_v = conf.max_v
    # Host-side numpy copies from the simulator (never read back from device:
    # a device->host read blocks ~30s on the axon tunnel at construction).
    P_scale = float(sim.cloth_mask_np.sum())

    links = np.array([[-1, 0], [1, 0], [0, -1], [0, 1],
                      [-1, -1], [1, -1], [-1, 1], [1, 1]])
    shifts = [int(-(di * W + dj)) for (di, dj) in links]
    # (8, HW) spring constants — passed as kernel inputs (broadcast blocks)
    rest_np = sim.rest_len_np[..., 0].reshape(HW, 8).T.copy()
    valid_np = sim.nbr_valid_np[..., 0].reshape(HW, 8).T.copy()
    REST_IN = jnp.asarray(rest_np, jnp.float32)  # (8, HW)
    VALID_IN = jnp.asarray(valid_np, jnp.float32)

    # ---------------- per-substep math on SoA blocks ---------------- #

    @jax.custom_vjp
    def _norm_grad3(x0, x1, x2):
        return x0, x1, x2

    def _ng_fwd(x0, x1, x2):
        return (x0, x1, x2), ()

    def _ng_bwd(_, g):
        g0, g1, g2 = g
        # per-env norm over the particle array (normalize_grad semantics,
        # cloth_simulator.py:189-194): g /= ||g||; nan->0; g /= P
        n = jnp.sqrt(jnp.sum(g0 * g0 + g1 * g1 + g2 * g2, axis=1, keepdims=True))
        out = []
        for gi in (g0, g1, g2):
            gi = gi / n
            gi = jnp.nan_to_num(gi)
            out.append(gi / P_scale)
        return tuple(out)

    _norm_grad3.defvjp(_ng_fwd, _ng_bwd)

    @jax.custom_vjp
    def _norm_grad_vec(p):
        return p

    def _ngv_fwd(p):
        return p, ()

    def _ngv_bwd(_, g):
        n = jnp.sqrt(jnp.sum(g * g, axis=1, keepdims=True))
        g = jnp.nan_to_num(g / n)
        return (g / P_scale,)

    _norm_grad_vec.defvjp(_ngv_fwd, _ngv_bwd)

    def _suction(x0, x1, x2, v0, v1, v2, ps, act):
        # ps: (B, 4) [px, py, pz, r]; act: (B, 4) [dx, dy, dz, suction]
        px, py, pz, r = ps[:, 0:1], ps[:, 1:2], ps[:, 2:3], ps[:, 3:4]
        d0, d1, d2 = x0 - px, x1 - py, x2 - pz
        # squared-distance compare (same mask as dist <= r, no sqrt)
        m = (d0 * d0 + d1 * d1 + d2 * d2 <= r * r).astype(dtype)
        suc = act[:, 3:4]
        v0 = m * (suc * v0) + (1 - m) * v0
        v1 = m * (suc * v1) + (1 - m) * v1
        v2 = m * (suc * v2) + (1 - m) * v2
        one_minus = 1.0 - suc
        x0 = m * (x0 + act[:, 0:1] * one_minus) + (1 - m) * x0
        x1 = m * (x1 + act[:, 1:2] * one_minus) + (1 - m) * x1
        x2 = m * (x2 + act[:, 2:3] * one_minus) + (1 - m) * x2
        x0, x1, x2 = _norm_grad3(x0, x1, x2)
        v0, v1, v2 = _norm_grad3(v0, v1, v2)
        return x0, x1, x2, v0, v1, v2

    def substep_math(x0, x1, x2, v0, v1, v2, ps0, ps1, a0, a1, stiff, mu,
                     INV_REST, VALID):
        """One cloth substep on (B, HW) component arrays. Mirrors
        engine/cloth.py _substep operator-for-operator (spring coefficient
        refactored to one rsqrt, see loop comment). INV_REST/VALID: lists of
        (1, HW) per-link constants, INV_REST = valid/rest."""
        v1 = v1 - gravity * dt

        # spring force: coef = stiff*(cur-rest)/(cur*rest) = stiff*(1/rest -
        # 1/cur) — one rsqrt per link instead of sqrt + two divides.
        # VALID/REST precombined: INV_REST_V = valid/rest, so
        # coef = stiff*(INV_REST_V - rsqrt(d2)*valid)
        f0 = jnp.zeros_like(x0)
        f1 = jnp.zeros_like(x0)
        f2 = jnp.zeros_like(x0)
        for l in range(8):
            s = shifts[l]
            n0 = _roll_lanes(x0, s)
            n1 = _roll_lanes(x1, s)
            n2 = _roll_lanes(x2, s)
            r0, r1, r2 = n0 - x0, n1 - x1, n2 - x2
            d2 = jnp.clip(r0 * r0 + r1 * r1 + r2 * r2, 1e-12, jnp.inf)
            inv_cur = jax.lax.rsqrt(d2)
            coef = stiff * (INV_REST[l] - inv_cur * VALID[l])
            f0 = f0 + coef * r0
            f1 = f1 + coef * r1
            f2 = f2 + coef * r2
        f1 = f1 - gravity

        # ground friction (cloth_simulator.py:280-306), divisions as rsqrt
        fm = (x1 <= small).astype(dtype)
        muF = mu * jnp.clip(f1, -jnp.inf, 0.0) * -1.0
        sV2 = v0 * v0 + v2 * v2 + small
        inv_sV = jax.lax.rsqrt(sV2)
        sV = sV2 * inv_sV
        dyn = fm * (sV > small).astype(dtype)
        f0 = f0 - dyn * muF * v0 * inv_sV
        f2 = f2 - dyn * muF * v2 * inv_sV

        stat = fm * (sV <= small).astype(dtype)
        sF2 = f0 * f0 + f2 * f2 + small
        inv_sF = jax.lax.rsqrt(sF2)
        sF = sF2 * inv_sF
        zero = stat * (muF > sF).astype(dtype)
        f0 = (1.0 - zero) * f0
        f2 = (1.0 - zero) * f2
        nonzero = stat * (muF <= sF).astype(dtype)
        R = 1.0 - muF * inv_sF
        f0 = (R * f0) * nonzero + f0 * (1.0 - nonzero)
        f2 = (R * f2) * nonzero + f2 * (1.0 - nonzero)

        v0 = (v0 + f0 * dt) * damping
        v1 = (v1 + f1 * dt) * damping
        v2 = (v2 + f2 * dt) * damping

        x0, x1, x2, v0, v1, v2 = _suction(x0, x1, x2, v0, v1, v2, ps0, a0)
        x0, x1, x2, v0, v1, v2 = _suction(x0, x1, x2, v0, v1, v2, ps1, a1)

        # ps = clip(ps + [da, 0], 0, 1) — the reference clips all 4 components
        # (radius included, a no-op for r in [0, 1]); primitives.py:322-323
        a0_pad = jnp.concatenate([a0[:, :3], jnp.zeros_like(a0[:, :1])], axis=1)
        a1_pad = jnp.concatenate([a1[:, :3], jnp.zeros_like(a1[:, :1])], axis=1)
        nps0 = jnp.clip(ps0 + a0_pad, 0.0, 1.0)
        nps1 = jnp.clip(ps1 + a1_pad, 0.0, 1.0)

        x0 = jnp.clip(x0, 0.0, 1.0)
        x1 = jnp.clip(x1, 0.0, 1.0)
        x2 = jnp.clip(x2, 0.0, 1.0)
        v0 = jnp.clip(v0, -max_v, max_v)
        v1 = jnp.clip(v1, -max_v, max_v)
        v2 = jnp.clip(v2, -max_v, max_v)
        x0 = x0 + dt * v0
        x1 = x1 + dt * v1
        x2 = x2 + dt * v2

        x0, x1, x2 = _norm_grad3(x0, x1, x2)
        v0, v1, v2 = _norm_grad3(v0, v1, v2)
        nps0 = _norm_grad_vec(nps0)
        nps1 = _norm_grad_vec(nps1)
        return x0, x1, x2, v0, v1, v2, nps0, nps1

    N_STATE = 8  # number of carried arrays above

    # ---------------- forward kernel ---------------- #

    def _load_consts(rest_r, valid_r):
        VALID = [valid_r[l : l + 1, :] for l in range(8)]
        INV_REST = [(VALID[l] / rest_r[l : l + 1, :]).astype(dtype)
                    for l in range(8)]
        VALID = [v.astype(dtype) for v in VALID]
        return INV_REST, VALID

    def fwd_kernel(x0r, x1r, x2r, v0r, v1r, v2r, ps0r, ps1r, a0r, a1r, kr, mur,
                   rest_r, valid_r,
                   ox0, ox1, ox2, ov0, ov1, ov2, ops0, ops1):
        stiff = kr[:, 0:1]
        mu = mur[:, 0:1]
        a0 = a0r[:]
        a1 = a1r[:]
        INV_REST, VALID = _load_consts(rest_r, valid_r)

        def body(_, carry):
            x0, x1, x2, v0, v1, v2, ps0, ps1 = carry
            return substep_math(x0, x1, x2, v0, v1, v2, ps0, ps1, a0, a1,
                                stiff, mu, INV_REST, VALID)

        init = (x0r[:], x1r[:], x2r[:], v0r[:], v1r[:], v2r[:], ps0r[:], ps1r[:])
        out = jax.lax.fori_loop(0, n_sub, body, init)
        for ref, val in zip((ox0, ox1, ox2, ov0, ov1, ov2, ops0, ops1), out):
            ref[:] = val

    # ---------------- backward kernel ---------------- #

    def bwd_kernel(x0r, x1r, x2r, v0r, v1r, v2r, ps0r, ps1r, a0r, a1r, kr, mur,
                   rest_r, valid_r,
                   gx0r, gx1r, gx2r, gv0r, gv1r, gv2r, gps0r, gps1r,
                   dx0, dx1, dx2, dv0, dv1, dv2, dps0, dps1, da0, da1, dk, dmu,
                   hx0, hx1, hx2, hv0, hv1, hv2, hp0, hp1):
        stiff = kr[:, 0:1]
        mu = mur[:, 0:1]
        a0 = a0r[:]
        a1 = a1r[:]
        INV_REST, VALID = _load_consts(rest_r, valid_r)
        hist = (hx0, hx1, hx2, hv0, hv1, hv2, hp0, hp1)

        # recompute forward, checkpointing every substep into VMEM scratch
        def fbody(t, carry):
            for ref, val in zip(hist, carry):
                ref[t] = val
            x0, x1, x2, v0, v1, v2, ps0, ps1 = carry
            return substep_math(x0, x1, x2, v0, v1, v2, ps0, ps1, a0, a1,
                                stiff, mu, INV_REST, VALID)

        init = (x0r[:], x1r[:], x2r[:], v0r[:], v1r[:], v2r[:], ps0r[:], ps1r[:])
        jax.lax.fori_loop(0, n_sub, fbody, init)

        # reverse sweep: exact substep adjoint via jax.vjp on the stored state
        def bbody(i, carry):
            t = n_sub - 1 - i
            gstate, ga0, ga1, gk, gmu = carry
            saved = tuple(ref[t] for ref in hist)

            def step_fn(state, a0_, a1_, k_, mu_):
                return substep_math(*state, a0_, a1_, k_, mu_, INV_REST, VALID)

            _, vjp = jax.vjp(step_fn, saved, a0, a1, stiff, mu)
            gstate, d_a0, d_a1, d_k, d_mu = vjp(gstate)
            return gstate, ga0 + d_a0, ga1 + d_a1, gk + d_k, gmu + d_mu

        g0 = (gx0r[:], gx1r[:], gx2r[:], gv0r[:], gv1r[:], gv2r[:],
              gps0r[:], gps1r[:])
        zero_a = jnp.zeros_like(a0)
        zero_k = jnp.zeros_like(stiff)
        gstate, ga0, ga1, gk, gmu = jax.lax.fori_loop(
            0, n_sub, bbody, (g0, zero_a, zero_a, zero_k, zero_k)
        )
        for ref, val in zip((dx0, dx1, dx2, dv0, dv1, dv2, dps0, dps1), gstate):
            ref[:] = val
        da0[:] = ga0
        da1[:] = ga1
        dk[:] = gk
        dmu[:] = gmu

    # ---------------- pallas_call plumbing ---------------- #

    def _env_spec(cols):
        return pl.BlockSpec((block_envs, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    big = functools.partial(_env_spec, HW)
    vec4 = functools.partial(_env_spec, 4)
    scal = functools.partial(_env_spec, 1)

    const_spec = pl.BlockSpec((8, HW), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [big(), big(), big(), big(), big(), big(), vec4(), vec4(),
                vec4(), vec4(), scal(), scal(), const_spec, const_spec]
    state_out_specs = [big(), big(), big(), big(), big(), big(), vec4(), vec4()]

    def _shapes(B):
        return (
            [jax.ShapeDtypeStruct((B, HW), dtype)] * 6
            + [jax.ShapeDtypeStruct((B, 4), dtype)] * 2
        )

    def fwd_call(inputs):
        B = inputs[0].shape[0]
        grid = (B // block_envs,)
        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=state_out_specs,
            out_shape=_shapes(B),
            interpret=interpret,
        )(*inputs, REST_IN, VALID_IN)

    def bwd_call(inputs, cotangents):
        B = inputs[0].shape[0]
        grid = (B // block_envs,)
        out_specs = state_out_specs + [vec4(), vec4(), scal(), scal()]
        out_shape = _shapes(B) + [
            jax.ShapeDtypeStruct((B, 4), dtype),
            jax.ShapeDtypeStruct((B, 4), dtype),
            jax.ShapeDtypeStruct((B, 1), dtype),
            jax.ShapeDtypeStruct((B, 1), dtype),
        ]
        scratch = (
            [pltpu.VMEM((n_sub, block_envs, HW), dtype)] * 6
            + [pltpu.VMEM((n_sub, block_envs, 4), dtype)] * 2
        )
        return pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=in_specs[:12] + [const_spec, const_spec] + state_out_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs, REST_IN, VALID_IN, *cotangents)

    # ---------------- SoA pack/unpack + custom_vjp wrapper ---------------- #

    def _pack(state, action):
        B = state.x.shape[0]
        x = state.x.reshape(B, HW, 3)
        v = state.v.reshape(B, HW, 3)
        # robot-step action prep (cloth_simulator.py:167-169)
        action0 = jnp.concatenate(
            [action[:, :3].clip(-2, 2) / n_sub, action[:, 3:4]], axis=1
        )
        action1 = jnp.concatenate(
            [action[:, 4:7].clip(-2, 2) / n_sub, action[:, 7:8]], axis=1
        )
        inputs = (
            x[:, :, 0], x[:, :, 1], x[:, :, 2],
            v[:, :, 0], v[:, :, 1], v[:, :, 2],
            state.primitive0, state.primitive1,
            action0, action1,
            state.stiffness.reshape(B, 1), state.mu.reshape(B, 1),
        )
        inputs = tuple(t.astype(dtype) for t in inputs)
        return inputs, (action0, action1)

    @jax.custom_vjp
    def _core(inputs):
        return tuple(fwd_call(list(inputs)))

    def _core_fwd(inputs):
        return _core(inputs), inputs

    def _core_bwd(inputs, g):
        outs = bwd_call(list(inputs), list(g))
        (dx0, dx1, dx2, dv0, dv1, dv2, dps0, dps1, da0, da1, dk, dmu) = outs
        return ((dx0, dx1, dx2, dv0, dv1, dv2, dps0, dps1, da0, da1, dk, dmu),)

    _core.defvjp(_core_fwd, _core_bwd)

    def robot_step(state, action):
        """Batched drop-in for ClothSimulator.step_batch. Batches that are
        not a multiple of BLOCK_ENVS are padded (rows replicated) and the
        pad rows sliced away after — cotangents only flow through real rows."""
        B_real = state.x.shape[0]
        pad = (-B_real) % block_envs
        if pad:
            # pad may exceed B_real (e.g. B=2 -> pad=6): tile, don't slice —
            # a short fill row count would leave B % BLOCK_ENVS != 0, a zero
            # pallas grid, and uninitialized outputs.
            reps = -(-pad // B_real)

            def _fill(t):
                return jnp.concatenate([t] + [t] * reps, axis=0)[: B_real + pad]

            state = jax.tree_util.tree_map(_fill, state)
            action = _fill(action)
        B = state.x.shape[0]
        inputs, (action0, action1) = _pack(state, action)
        x0, x1, x2, v0, v1, v2, nps0, nps1 = _core(inputs)
        x = jnp.stack([x0, x1, x2], axis=-1).reshape(B, H, W, 3).astype(jnp.float32)
        v = jnp.stack([v0, v1, v2], axis=-1).reshape(B, H, W, 3).astype(jnp.float32)
        key = jax.vmap(lambda k: jax.random.split(k)[0])(state.key)
        nps0 = nps0.astype(jnp.float32)
        nps1 = nps1.astype(jnp.float32)
        nstate = state._replace(
            x=x, v=v, primitive0=nps0, primitive1=nps1,
            action0=action0, action1=action1, key=key,
        )
        if pad:
            nstate = jax.tree_util.tree_map(lambda t: t[:B_real], nstate)
        return nstate, nstate

    robot_step._core = _core  # exposed for profiling/tests
    robot_step._pack = _pack
    return robot_step
