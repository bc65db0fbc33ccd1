"""Fused Pallas (Mosaic) MPPI rollout kernels — the TPU-native replacement for
the reference's CUDA rollout + reduction pipeline.

The reference materializes the full (K, T, a) noise tensor in GPU global
memory (written by `save_e`, reference src/point_mass_gpu.cu:123-129) and then
re-reads it T times through the per-timestep `update_act` reduction ladder
(reference src/point_mass.cu:384-480 — its flagged bottleneck). Here the noise
NEVER touches HBM at all:

  * **Kernel A** (`pallas_rollout_costs`): for each K-tile, generate ε on-chip
    (`pltpu.prng_random_bits` → Box-Muller), integrate the LTI dynamics over
    the horizon T in registers, and write out only the per-rollout total
    cost S (4 bytes per rollout).
  * host-side: softmin over S — β (min), η (sum), weights (tiny, XLA-fused;
    `lax.pmin`/`psum` across the mesh when sharded).
  * **Kernel B** (`pallas_weighted_update`): re-seed the SAME PRNG stream,
    regenerate ε tile by tile, and accumulate ΔU[t] = Σ_k w_k ε_k[t] across
    the grid.

At K=10⁵, T=200, a=3 this avoids 240 MB of HBM writes + ≥240 MB of reads per
solve; regeneration costs only VPU flops, which is the cheap currency on TPU.

Layout notes (TPU tiling is (8 sublanes × 128 lanes) for f32):

  * Rollouts live on the **lane** axis: every per-rollout quantity is an
    (8, KB) tile, KB lanes of rollouts per grid step.
  * **Group packing**: action/state dims occupy only `A` sublanes, so
    G = 8//A independent rollout *groups* are packed into the 8 sublanes
    (rows g*A..g*A+A-1 = group g). One (8, KB) tile therefore carries G·KB
    rollouts — at a=3 that doubles throughput vs. naive sublane padding, the
    "pack tiny dims into (8,128) tiles" move the survey calls out (§7).
  * Costs accumulate **elementwise** into an (8, KB) register accumulator;
    the per-group sublane reductions happen once at kernel end, not per step.
  * There is **no dynamic indexing** anywhere (Mosaic requires lane indices
    to be 128-multiples, and dynamic sublane refs compile poorly). The
    nominal sequence U sits in VMEM as one (8, T_pad) tile; step t extracts
    its column with a one-hot lane mask + lane reduction, and kernel B
    scatters ΔU_t into its (8, T_pad) accumulator with the same one-hot.
  * K is padded up to the tile geometry; padded slots get cost=BIG so their
    softmin weight underflows to exactly 0 and they vanish from ΔU.

Rollout indexing convention (must agree between kernels A and B and the
caller): rollout id = g * (Kpad/G) + i * KB + lane, for group g, grid step i.
Kernel A's (G, Kpad/G) output flattens to exactly this order.

Beyond the two-kernel form above, the hot path now runs as a SINGLE launch:
the ONE-PASS kernels (`_onepass_solve_kernel` and friends) stage each
tile's ε in VMEM and fold the softmin + weighted update into the rollout
sweep with an online (flash-attention-style) rescale; the PLANAR layout
(`plan.planar`) removes the row-packed layout's waste — sublane padding
for the elementwise-per-dim families (dims on tiles, A=3), and since
round 5 the A× group-DUPLICATION of every dynamics/cost op for the
coupled families (STATE-planar: rows are whole rollouts, each state
component on its own tile — `COUPLED_PLANAR_FAMILIES`); fleet variants
batch R robots as a grid axis; and the sharded path runs the same
one-pass core per device with an associative cross-device combine.
docs/kernels.md is the narrative map of all of this with the measured
effect of each step.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mppi_gpu_tpu.ops.cost import QuadraticCost

SUB = 8        # f32 sublane tile
LANE = 128     # lane tile
BIG = 3.0e38   # finite "infinity" for padded rollouts (inlined literal)
CH = 8         # timesteps per static chunk in the one-pass weighted update

# Interpreter config for the off-TPU (CPU) test path. Eager DMA execution:
# the default deferred ("on_wait") mode intermittently livelocks inside the
# interpreter's store callbacks when 8 shard_map device threads interpret
# kernels concurrently (observed under tests/_sharded_pallas_check.py).
_INTERPRET = pltpu.InterpretParams(dma_execution_mode="eager")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_kb(K_lanes: int, antithetic: bool) -> int:
    """Lanes of rollouts per grid step. Must be a multiple of 256 (the
    Box-Muller pair trick concatenates two KB/2 halves, each ≥1 lane tile) —
    512 with antithetic mirroring on top. 2048 measured fastest on v5e at
    K=10⁵; tunable via MPPI_PALLAS_KB."""
    gran = 512 if antithetic else 256
    # round any override UP to the required granularity: an unaligned KB
    # would falsify the kernels' pl.multiple_of(i*KB, 128) alignment claims
    # and silently corrupt the fused kernel's scratch slicing
    kb = _round_up(max(gran, int(os.environ.get("MPPI_PALLAS_KB", "2048"))), gran)
    if K_lanes <= kb:
        return max(gran, _round_up(K_lanes, gran))
    return kb


class PallasPlan(NamedTuple):
    """Static geometry shared by both kernels."""
    K: int        # true rollout count
    A: int        # action dim
    G: int        # rollout groups packed per tile (SUB // A)
    KB: int       # rollout lanes per grid step
    Kpg: int      # padded rollouts per group (= lanes per group = grid*KB)
    T: int
    Tpad: int
    anti: bool = False   # antithetic: lanes [KB/2, KB) mirror lanes [0, KB/2)
    ou: bool = False     # OU noise recursion enabled (static: β=0 compiles it out)
    testmode: bool = False  # deterministic pseudo-noise instead of the PRNG:
                            # full-kernel verification on CPU (the Mosaic
                            # interpreter stubs prng_random_bits to zeros).
                            # The pseudo-noise folds in the seed words, so
                            # distinct keys (e.g. per-shard folded keys under
                            # a mesh) still decorrelate.
    family: str = "lti"     # fused (dynamics, cost) family — see FAMILIES
    extra: int = 0          # family-specific static extra (obstacle count)
    onepass: bool = False   # single-pass fused kernel: the tile's ε is staged
                            # in a VMEM buffer during the rollout and re-read
                            # for the weighted update (online-softmin rescale
                            # across tiles), instead of being regenerated —
                            # roofline-measured to remove both the second
                            # Box-Muller pass AND the per-step one-hot scatter
                            # (together ~45 % of the solve at K=10⁵, T=200)
    planar: bool = False    # dims-on-tiles layout for the one-pass fused core:
                            # rows = SUB whole rollout groups, one (SUB, KBp)
                            # ε/state tile PER ACTION DIM — zero sublane
                            # padding when SUB % A != 0 (A=3 wastes 25 % of
                            # the generated noise in the row-packed layout;
                            # docs/kernels.md roofline). Only the fused
                            # one-pass core and the noise dump implement it;
                            # kernels A/B (the sharded path) stay row-packed.
    KBp: int = 0            # planar lane count (the A-fold ε stage shrinks it
                            # independently of KB, so the row-packed kernels
                            # keep their own swept-optimal tile width)
    u3: bool = True         # one-pass row-packed kernel takes the
                            # lane-replicated U table (4·T·SUB·LANE bytes of
                            # VMEM, ~0.3 ms faster at T=200); False at long T
                            # where the table would blow the VMEM ceiling —
                            # the kernel falls back to the one-hot lane
                            # extraction of U[t] (bit-identical values)

    @property
    def Kpad(self) -> int:  # total padded rollouts
        return self.G * self.Kpg

    @property
    def grid(self) -> int:
        return self.Kpg // self.KB

    @property
    def Tc(self) -> int:    # horizon rounded up to the update-chunk size
        return _round_up(self.T, CH)

    @property
    def stageKB(self) -> int:
        # ε stage-buffer lane width (row-packed): antithetic stores only the
        # positive half — mirrors are exact negatives (the OU recursion is
        # linear), so the update folds them as (w⁺ − w⁻)·ε⁺
        return self.KB // 2 if self.anti else self.KB

    @property
    def stageKB_p(self) -> int:  # same, planar
        return self.KBp // 2 if self.anti else self.KBp

    # ---- planar-layout geometry (valid when self.planar) -----------------
    @property
    def Kpg_p(self) -> int:  # padded rollouts per sublane row (planar)
        return _round_up(_round_up(self.K, SUB) // SUB, self.KBp)

    @property
    def grid_p(self) -> int:
        return self.Kpg_p // self.KBp

    @property
    def Kpad_p(self) -> int:  # total padded rollouts (planar)
        return SUB * self.Kpg_p


def make_plan(
    K: int, T: int, action_dim: int, antithetic: bool = False, ou_beta: float = 0.0,
    testmode: bool = False, family: str = "lti", extra: int = 0,
) -> PallasPlan:
    if not 1 <= action_dim <= SUB:
        raise ValueError(f"pallas backend supports 1<=action_dim<={SUB}, got {action_dim}")
    if antithetic and K % 2 != 0:
        raise ValueError(f"antithetic sampling needs even K, got {K}")
    if family not in FAMILIES:
        raise ValueError(f"unknown fused family '{family}'; known: {sorted(FAMILIES)}")
    G = SUB // action_dim
    KB = _pick_kb(_round_up(K, G) // G, antithetic)
    # One-pass eligibility: the ε stage buffer (Tc, SUB, KB) — (A, Tc, SUB,
    # KB) in the planar layout — must fit the VMEM budget. When a smaller KB
    # makes it fit, shrink KB — the KB choice is part of the plan (NOT a
    # kernel-local decision) so every consumer of the same (K, T, A, …)
    # arguments — kernels A/B, the fused core, the noise-dump kernel —
    # shares one tile geometry and hence one PRNG stream.
    onepass = os.environ.get("MPPI_PALLAS_ONEPASS", "1") != "0"
    planar, KBp, u3 = False, 0, True
    gran = 512 if antithetic else 256
    # default swept on v5e at K=10⁵, T=200: 11 MB → KB=1792 (1.83 ms) vs
    # 7 MB → KB=1024 (1.97 ms) vs 13 MB → KB=2048 (1.86 ms); v5e VMEM is
    # ~16 MB so 11 MB leaves room for the U table + state tiles of the
    # largest (13-tile quadrotor3d) family
    budget = int(
        float(os.environ.get("MPPI_PALLAS_EPS_VMEM_MB", "11")) * 2**20
    )
    if (
        onepass
        and os.environ.get("MPPI_PALLAS_PLANAR", "1") != "0"
        and (
            # elementwise-per-dim families: planar pays only when the
            # row-packed layout would waste sublane rows (SUB % A != 0)
            (family in PLANAR_FAMILIES and SUB % action_dim != 0)
            # coupled families: planar ALWAYS pays — the row-packed layout
            # duplicates each group's state across its A rows, so the
            # dynamics/cost stream runs at A× (round 5; docs/kernels.md)
            or family in COUPLED_PLANAR_FAMILIES
        )
    ):
        # planar lane count: its own budget cut (A stage buffers), its own
        # field — the row-packed kernels (A/B, the sharded path) keep KB
        bytes_per_lane = _round_up(T, CH) * action_dim * SUB * 4
        if antithetic:
            bytes_per_lane //= 2  # only ε⁺ is staged (see PallasPlan.stageKB)
        cap = budget // bytes_per_lane // gran * gran
        if cap >= gran:
            planar = True
            KBp = min(KB, cap)
    if onepass:
        # KB cap from FULL-eps sizing: under antithetic only ε⁺ is staged
        # (half the bytes), but letting that RAISE KB hurts register-heavy
        # families (quadrotor3d anti measured 6.2 ms at KB=1536 vs 6.7 at
        # 2048) — so the half-sizing only extends ELIGIBILITY at long T,
        # never widens the tile
        bpl_full = _round_up(T, CH) * SUB * 4      # sizing heuristic bytes/lane
        bpl_staged = bpl_full // 2 if antithetic else bpl_full  # actual stage
        cap = budget // bpl_full // gran * gran
        # eligibility from the ACTUAL staged bytes, floored only after the
        # halving — flooring cap (a gran multiple) first made cap_elig 0
        # whenever cap was 0, so long-T antithetic plans silently lost the
        # one-pass form even when the halved stage fit (ADVICE round 3)
        cap_elig = budget // bpl_staged // gran * gran
        # hard VMEM ceiling: besides the ε stage the one-pass kernel holds
        # the lane-replicated U table u3 (4·T·SUB·LANE B) and the ΔU
        # accumulator + output tiles (2·4·SUB·Tpad B) — the sweep knob
        # (MPPI_PALLAS_EPS_VMEM_MB) doesn't cover them, so near the edge a
        # "budget-eligible" plan could exceed physical VMEM at compile time
        # (ADVICE round 3)
        acc_bytes = 2 * SUB * _round_up(T, LANE) * 4
        u3_bytes = T * SUB * LANE * 4
        ceil = int(
            float(os.environ.get("MPPI_PALLAS_VMEM_CEIL_MB", "15")) * 2**20
        )
        cap_hard = max(ceil - acc_bytes - u3_bytes, 0) // bpl_staged // gran * gran
        if cap_hard < gran <= max(cap, cap_elig):
            # the U table is what blows VMEM (long T): drop it — the kernel
            # falls back to the one-hot lane extraction of U[t], which reads
            # the (SUB, Tpad) u_ref it already has (bit-identical values)
            u3 = False
            cap_hard = max(ceil - acc_bytes, 0) // bpl_staged // gran * gran
        if min(cap, cap_hard) >= gran:
            KB = min(KB, cap, cap_hard)
        elif min(cap_elig, cap_hard) >= gran:
            # long-T antithetic: the halved stage fits
            KB = min(KB, cap_elig, cap_hard)
        elif not planar:
            onepass = False  # horizon too long to stage ε — two-pass fallback
    Kpg = _round_up(_round_up(K, G) // G, KB)
    return PallasPlan(
        K=K, A=action_dim, G=G, KB=KB, Kpg=Kpg, T=T,
        Tpad=_round_up(T, LANE), anti=antithetic, ou=float(ou_beta) != 0.0,
        testmode=testmode, family=family, extra=extra, onepass=onepass,
        planar=planar, KBp=KBp, u3=u3,
    )


def _standard_normal(shape: tuple[int, int]) -> jax.Array:
    """(rows, cols) standard normals from the on-chip PRNG via Box-Muller.
    `cols` must be even; each uniform pair yields two normals (cos & sin
    branches), halving the transcendental count. Replaces the reference's
    per-thread cuRAND state dance (reference src/point_mass.cu:493-506)."""
    rows, cols = shape
    half = (rows, cols // 2)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    # mantissa bits → uniform [0,1): bitcast trick, exact and branch-free
    u1 = pltpu.bitcast((b1 >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
    u2 = pltpu.bitcast((b2 >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
    # r=0 when u1=0 is fine (log1p(-0)=0); theta uniform in [0, 2π)
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    theta = (2.0 * jnp.pi) * u2
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)


def _fake_normal(t, tile, KB: int, sid):
    """Deterministic pseudo-noise for testmode: a smooth function of
    (t, tile, row, lane, seed) that the host can replicate exactly
    (:func:`fake_noise_tensor`), giving full-kernel verification where the
    interpreter's PRNG is stubbed. `sid` is the seed-derived stream id, so
    distinct keys (e.g. per-shard folded keys) give distinct noise."""
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 1).astype(jnp.float32)
    return jnp.sin(
        0.917 * jnp.float32(t) + 0.379 * lane + 1.37 * row
        + 2.11 * jnp.float32(tile) + 0.547 * sid
    )


def _seed_stream_id(key: jax.Array) -> jax.Array:
    """f32 stream id the testmode noise folds in — must match the kernels'
    `ints_ref[0,0] & 1023` on the packed seed word (see :func:`pack_inputs`)."""
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed0 = jax.lax.bitcast_convert_type(kd[:2], jnp.int32)[0]
    return (seed0 & jnp.int32(1023)).astype(jnp.float32)


def fake_noise_tensor(
    plan: PallasPlan, sigma, ou_beta: float = 0.0, key: jax.Array | None = None
) -> jax.Array:
    """Host twin of the kernels' testmode noise: (T, Kpad, A) epsilon tensor
    in ROLLOUT-RANK order, with the OU recursion and antithetic mirroring
    applied identically. Feed it to the scan-path oracle to verify kernel
    output exactly. `key` must match the key handed to the kernels (defaults
    to `jax.random.key(0)`)."""
    assert plan.testmode
    T, A, G, KB, Kpg = plan.T, plan.A, plan.G, plan.KB, plan.Kpg
    sid = _seed_stream_id(key if key is not None else jax.random.key(0))
    # rank r lives at flat lane index perm[r] (identity without antithetic)
    k = anti_rank_perm(plan) if plan.anti else jnp.arange(plan.Kpad)
    g, rem = k // Kpg, k % Kpg
    tile, lane = rem // KB, rem % KB
    if plan.anti:
        half = KB // 2
        sign = jnp.where(lane < half, 1.0, -1.0)
        lane = jnp.where(lane < half, lane, lane - half)
    else:
        sign = jnp.ones_like(lane, jnp.float32)
    row = g[:, None] * A + jnp.arange(A)[None, :]            # (Kpad, A)
    t = jnp.arange(T, dtype=jnp.float32)[:, None, None]
    n = sign[None, :, None] * jnp.sin(
        0.917 * t + 0.379 * lane[None, :, None].astype(jnp.float32)
        + 1.37 * row[None, :, :].astype(jnp.float32)
        + 2.11 * tile[None, :, None].astype(jnp.float32)
        + 0.547 * sid
    )                                                         # (T, Kpad, A)
    if ou_beta:
        c = (1.0 - ou_beta**2) ** 0.5

        def body(prev, nt):
            e = ou_beta * prev + c * nt
            return e, e

        _, tail = jax.lax.scan(body, n[0], n[1:])
        n = jnp.concatenate([n[:1], tail], axis=0)
    return jnp.broadcast_to(sigma, (A,)) * n


def _next_eps(t, e_prev, sigma, scal_ref, KB: int, anti: bool, ou: bool, tile=0, testmode: bool = False, sid=None):
    """One step of the unit-variance OU noise process:
    e_t = β e_{t−1} + √(1−β²) ν_t, primed with e_0 = ν_0. Returns
    (ε_t = σ·e_t, e_t). The recursion is deterministic given the PRNG
    stream, so kernels A and B replay identical correlated noise. `ou` is
    STATIC: the iid (β=0) kernels carry no recursion ops at all."""
    if testmode:
        if anti:
            n = _fake_normal(t, tile, KB // 2, sid)
            n = jnp.concatenate([n, -n], axis=1)
        else:
            n = _fake_normal(t, tile, KB, sid)
    elif anti:
        n = _standard_normal((SUB, KB // 2))
        n = jnp.concatenate([n, -n], axis=1)
    else:
        n = _standard_normal((SUB, KB))
    if not ou:
        return sigma * n, e_prev
    beta, c = scal_ref[0, 3], scal_ref[0, 4]
    e = jnp.where(t == 0, n, beta * e_prev + c * n)
    return sigma * e, e


def _onehot_lanes(t: jax.Array, n: int) -> jax.Array:
    """(1, n) f32 one-hot of lane index t (2D iota — 1D iota is illegal on TPU)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return (lanes == t).astype(jnp.float32)


def _lane_rank(plan: PallasPlan, i, shape=None):
    """(G, KB) global rollout RANK of each lane in grid step i. Plain lane
    order normally; with antithetic, mirror pairs (m, m+KB/2) get adjacent
    ranks (2m, 2m+1) so the K-padding mask can never split an (ε, −ε) pair
    (K is even by construction)."""
    G, KB = plan.G, plan.KB
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, KB), 1)
    if plan.anti:
        half = KB // 2
        m = jnp.where(lane < half, lane, lane - half)
        lane = 2 * m + (lane >= half).astype(jnp.int32)
    return (
        jax.lax.broadcasted_iota(jnp.int32, (G, KB), 0) * plan.Kpg
        + i * KB
        + lane
    )


def anti_rank_perm(plan: PallasPlan) -> jax.Array:
    """(Kpad,) gather indices: rank-ordered vector = lane_flat[perm]. Only
    meaningful when plan.anti (identity otherwise). Row-packed form of the
    layout-generic :func:`_anti_perm` (the planar paths call that one with
    their own Kpad_p/KBp)."""
    return _anti_perm(plan.Kpad, plan.KB)


def _seed(seed0, seed1, i):
    # fold the grid position into seed word 0 (golden-ratio odd constant);
    # kernels A and B MUST seed identically to replay the same ε stream.
    # `seed0`/`seed1` are int32 scalars read from the packed ints — scalars
    # (not a ref) so the fleet kernels can hand in THEIR robot's row.
    pltpu.prng_seed(seed0 + i * jnp.int32(-1640531527), seed1)


def _kernel_sid(seed0, plan: PallasPlan):
    """Testmode stream id from the packed seed word (host twin:
    :func:`_seed_stream_id`); None outside testmode so the real-PRNG kernels
    carry no extra ops."""
    if not plan.testmode:
        return None
    return (seed0 & jnp.int32(1023)).astype(jnp.float32)


# --------------------------------------------------------------------------
# Fused (dynamics, cost) families.
#
# The kernels are generic over a "family": the noise machinery, the one-hot
# U extraction, the K-masking, the per-group sublane reduction, the softmin
# and the weighted update are all shared; a family contributes only the
# per-step state integration + state-cost tile math (pure VPU ops on
# (SUB, KB) tiles, rows = packed rollout groups) and its parameter packing.
# This is the TPU equivalent of the reference's rollout kernel being generic
# over the device model (reference src/point_mass.cu:493-508 templating on
# PointMassModelGpu).
#
# Common P-matrix columns (every family): 0 = noise σ, 1 = Σ⁻¹ diagonal.
# Columns are group-tiled: row g*A+i holds the value for action dim i.
_P_SIGMA, _P_INVS = 0, 1


def _sincos_small(x):
    """(sin x, cos x) for the SMALL per-step half-increment angles of the
    trig-carry families, as degree-7/8 Taylor polynomials — no range
    reduction, because the argument is bounded by construction: the
    increments are (rate · dt/2)-shaped, the on-chip Box-Muller sampler
    caps noise at √(2·24·ln2) ≈ 5.8σ (24-bit uniform), and the trig-carry
    families' rates are either saturated (arm: |qd| ≤ 12 → |δ| ≤ 0.1),
    directly noise-capped (unicycle: |δ| ≤ 0.21 at bench σ), or slow
    integrals of capped torques (quadrotor/cartpole: |δ| ≲ 0.2 in any
    reachable rollout). Truncation error ≤ |x|⁹/9! (sin) and |x|¹⁰/10!
    (cos): at |x| = 0.5 that is 5.4e-9 / 2.7e-10 — BELOW one f32 ulp of
    the result, so the values are within a bit of the correctly-rounded
    transcendental across the entire physical range (and still ~2e-6
    relative at an absurd |x| = 1, far inside every oracle tolerance).
    Replaces a ~34-poly-op range-reduced transcendental chain with ~5 ops
    (docs/kernels.md 'removing math').

    Out-of-range behavior (|x| ≳ 1): the polynomial diverges like x⁹/9!
    instead of staying bounded. The only reachable path there is a rollout
    whose dynamics are ALREADY exploding (e.g. the cart-pole's θ̇²
    feedback blowup — which diverges with true trig too, just shaped
    differently): such rollouts carry astronomically large cost, their
    softmin weight underflows to exactly 0, and f32 overflow propagates to
    inf → the divergence guard exactly as on the true-trig path (tested:
    tests/test_pallas.test_taylor_delta_extreme_state_stays_finite). A
    user family with a LARGE step angle by construction (huge dt × rate
    with no saturation) should not adopt this helper — use jnp.sin/cos."""
    x2 = x * x
    s = x * (1.0 + x2 * (-1.0 / 6.0 + x2 * (1.0 / 120.0 + x2 * (-1.0 / 5040.0))))
    c = 1.0 + x2 * (
        -0.5 + x2 * (1.0 / 24.0 + x2 * (-1.0 / 720.0 + x2 * (1.0 / 40320.0)))
    )
    return s, c


class _LTIQuadFamily:
    """Analytic LTI double-integrator + quadratic cost — the reference's own
    model (src/point_mass_gpu.cu:97-106, src/cost.cu:42-64). State (q, qd),
    each A dims → rows g*A+i of two (SUB, KB) register tiles."""

    name = "lti"
    NP = 8  # P columns: sigma, inv_s, wq, wqd, gq, gqd, x0q, x0qd
    _WQ, _WQD, _GQ, _GQD, _X0Q, _X0QD = 2, 3, 4, 5, 6, 7

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.point_mass import PointMassLTI

        return isinstance(dyn, PointMassLTI) and type(cost) is QuadraticCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        A = plan.A
        w, g = cost.w.astype(jnp.float32), cost.goal.astype(jnp.float32)
        x0 = jnp.broadcast_to(x0, (2 * A,)).astype(jnp.float32)
        return jnp.stack(
            [
                tileA(sigma), tileA(cost.inv_s),
                tileA(w[:A]), tileA(w[A:]),      # state-cost diag (q, qd)
                tileA(g[:A]), tileA(g[A:]),      # goal (q, qd)
                tileA(x0[:A]), tileA(x0[A:]),    # initial state (q, qd)
            ],
            axis=1,
        )  # (SUB, NP)

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        KB = plan.KB
        """(carry0, step, final) closures on (SUB, KB) tiles. `step` returns
        the state-cost increment evaluated on x_{t+1} (reference
        src/point_mass_gpu.cu:107); the generic phase adds the λ·uᵀΣ⁻¹ε
        control term."""
        dt = scal_ref[0, 0]
        hdt2 = 0.5 * dt * dt
        col = lambda i: p_ref[:, i:i + 1]  # noqa: E731
        wq, wqd = col(cls._WQ), col(cls._WQD)
        gq, gqd = col(cls._GQ), col(cls._GQD)

        def state_cost(q, qd):
            dq, dqd = q - gq, qd - gqd
            return wq * dq * dq + wqd * dqd * dqd

        def carry0():
            return (
                jnp.broadcast_to(col(cls._X0Q), (SUB, KB)),
                jnp.broadcast_to(col(cls._X0QD), (SUB, KB)),
            )

        def step(state, u_eff):
            q, qd = state
            # LTI point-mass integrate (reference src/point_mass_gpu.cu:97-106)
            q = q + dt * qd + hdt2 * u_eff
            qd = qd + dt * u_eff
            return (q, qd), state_cost(q, qd)

        def final(state):
            # terminal cost re-counts the final state (reference parity: the
            # last step cost already included x_T and final_cost adds it
            # again — src/cost.cu:57-64)
            return state_cost(*state)

        return carry0, step, final

    @classmethod
    def pack_planar(cls, dyn, cost, x0, sigma, plan):
        """(A, NP) per-dim parameter rows for the planar kernels — same
        column semantics as :meth:`pack`, one row per action dim."""
        A = plan.A
        w, g = cost.w.astype(jnp.float32), cost.goal.astype(jnp.float32)
        x0 = jnp.broadcast_to(x0, (2 * A,)).astype(jnp.float32)
        return jnp.stack(
            [
                jnp.broadcast_to(sigma, (A,)).astype(jnp.float32),
                jnp.broadcast_to(cost.inv_s, (A,)).astype(jnp.float32),
                w[:A], w[A:], g[:A], g[A:], x0[:A], x0[A:],
            ],
            axis=1,
        )  # (A, NP)

    @classmethod
    def build_planar(cls, p_at, scal_ref, plan: 'PallasPlan'):
        """Planar form: per-dim (SUB, KBp) state tiles whose rows are whole
        rollouts; dims couple only through the cost accumulator."""
        A, KB = plan.A, plan.KBp
        dt = scal_ref[0, 0]
        hdt2 = 0.5 * dt * dt
        wq = [p_at(i, cls._WQ) for i in range(A)]
        wqd = [p_at(i, cls._WQD) for i in range(A)]
        gq = [p_at(i, cls._GQ) for i in range(A)]
        gqd = [p_at(i, cls._GQD) for i in range(A)]

        def state_cost(q, qd):
            c = jnp.zeros((SUB, KB), jnp.float32)
            for i in range(A):
                dq, dqd = q[i] - gq[i], qd[i] - gqd[i]
                c = c + wq[i] * dq * dq + wqd[i] * dqd * dqd
            return c

        def carry0():
            bc = lambda v: jnp.broadcast_to(  # noqa: E731
                jnp.asarray(v, jnp.float32), (SUB, KB)
            )
            return (
                tuple(bc(p_at(i, cls._X0Q)) for i in range(A)),
                tuple(bc(p_at(i, cls._X0QD)) for i in range(A)),
            )

        def step(state, acts):
            q, qd = state
            q2 = tuple(q[i] + dt * qd[i] + hdt2 * acts[i] for i in range(A))
            qd2 = tuple(qd[i] + dt * acts[i] for i in range(A))
            return (q2, qd2), state_cost(q2, qd2)

        def final(state):
            return state_cost(*state)

        return carry0, step, final


class _PendulumFamily:
    """Torque-limited pendulum swing-up: RK2-midpoint integration of
    θ̈ = (g/l)·sin θ + u/(m l²) − b·θ̇ with the wrap-safe trig cost
    w_angle·(1−cos θ) + w_vel·θ̇² (models/pendulum.py, ops/cost.py
    PendulumSwingupCost). First nonlinear fused family: sin/cos are single
    VPU transcendentals, state (θ, θ̇) packs A=1 → 8 groups per tile."""

    name = "pendulum"
    NP = 9  # sigma, inv_s, w_angle, w_vel, x0_th, x0_thd, g/l, 1/(m l²), b
    _WANG, _WVEL, _X0TH, _X0THD, _GL, _IML2, _DAMP = 2, 3, 4, 5, 6, 7, 8

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.pendulum import PendulumDynamics
        from mppi_gpu_tpu.ops.cost import PendulumSwingupCost

        return isinstance(dyn, PendulumDynamics) and type(cost) is PendulumSwingupCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (2,)).astype(jnp.float32)
        gl = dyn.gravity / dyn.length
        iml2 = 1.0 / (dyn.mass * dyn.length**2)
        return jnp.stack(
            [
                tileA(sigma), tileA(cost.inv_s),
                tileA(cost.w_angle), tileA(cost.w_vel),
                tileA(x0[0]), tileA(x0[1]),
                tileA(gl), tileA(iml2), tileA(dyn.damping),
            ],
            axis=1,
        )  # (SUB, NP)

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        KB = plan.KB
        dt = scal_ref[0, 0]
        col = lambda i: p_ref[:, i:i + 1]  # noqa: E731
        w_ang, w_vel = col(cls._WANG), col(cls._WVEL)
        gl, iml2, damp = col(cls._GL), col(cls._IML2), col(cls._DAMP)

        def accel_s(s_th, thd, u):
            # mirrors PendulumDynamics accel on a precomputed sin θ
            return gl * s_th + iml2 * u - damp * thd

        def state_cost(c_th, thd):
            # the wrap-safe angle term consumes the CARRIED cos θ
            return w_ang * (1.0 - c_th) + w_vel * thd * thd

        def carry0():
            # carry = (θ̇, sin θ, cos θ): θ itself is not carried — the
            # dynamics consume sin, the cost cos, and both advance by
            # small-angle-δ additions (δ = θ̇·dt/2; see _sincos_small).
            # With REAL δ trig this form was measured-NEGATIVE (3 → 4
            # transcendentals); the ~5-op Taylor pairs flip it to 3 → 0.
            th = jnp.broadcast_to(col(cls._X0TH), (SUB, KB))
            return (
                jnp.broadcast_to(col(cls._X0THD), (SUB, KB)),
                jnp.sin(th), jnp.cos(th),
            )

        def step(state, u_eff):
            thd, s_th, c_th = state
            # RK2 midpoint — mirrors PendulumDynamics.step to f32 rounding
            # (θm = θ + δ1, θ' = θm + δ2 by angle addition)
            k1_thd = accel_s(s_th, thd, u_eff)
            s_d1, c_d1 = _sincos_small(0.5 * dt * thd)
            s_m = s_th * c_d1 + c_th * s_d1
            c_m = c_th * c_d1 - s_th * s_d1
            thd_m = thd + 0.5 * dt * k1_thd
            k2_thd = accel_s(s_m, thd_m, u_eff)
            s_d2, c_d2 = _sincos_small(0.5 * dt * thd + 0.5 * dt * dt * k1_thd)
            s_th = s_m * c_d2 + c_m * s_d2
            c_th = c_m * c_d2 - s_m * s_d2
            thd = thd + dt * k2_thd
            return (thd, s_th, c_th), state_cost(c_th, thd)

        def final(state):
            thd, s_th, c_th = state
            return state_cost(c_th, thd)

        return carry0, step, final


class _CartPoleFamily:
    """Cart-pole balance: RK2-midpoint of the classic coupled nonlinear
    cart-pole ODE (models/cartpole.py) with the wrap-safe balance cost
    (ops/cost.py CartPoleBalanceCost). First fused family with COUPLED
    dynamics — state (p, θ, ṗ, θ̇) is four register tiles; the two VPU
    divides per step (shared denominator structure) are the only ops the
    other families don't have."""

    name = "cartpole"
    NP = 15  # sigma, inv_s, w0..w3, x0 (4), m_p·l, 1/(m_c+m_p), m_p/(m_c+m_p), l, g
    _W0, _W1, _W2, _W3 = 2, 3, 4, 5
    _X0P, _X0TH, _X0PD, _X0THD = 6, 7, 8, 9
    _MPL, _INVTOT, _MPFRAC, _L, _G = 10, 11, 12, 13, 14

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.cartpole import CartPoleDynamics
        from mppi_gpu_tpu.ops.cost import CartPoleBalanceCost

        return isinstance(dyn, CartPoleDynamics) and type(cost) is CartPoleBalanceCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (4,)).astype(jnp.float32)
        total = dyn.cart_mass + dyn.pole_mass
        w = cost.w.astype(jnp.float32)
        return jnp.stack(
            [
                tileA(sigma), tileA(cost.inv_s),
                tileA(w[0]), tileA(w[1]), tileA(w[2]), tileA(w[3]),
                tileA(x0[0]), tileA(x0[1]), tileA(x0[2]), tileA(x0[3]),
                tileA(dyn.pole_mass * dyn.pole_length),
                tileA(1.0 / total),
                tileA(dyn.pole_mass / total),
                tileA(dyn.pole_length),
                tileA(dyn.gravity),
            ],
            axis=1,
        )  # (SUB, NP)

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        KB = plan.KB
        dt = scal_ref[0, 0]
        col = lambda i: p_ref[:, i:i + 1]  # noqa: E731
        w0, w1, w2, w3 = col(cls._W0), col(cls._W1), col(cls._W2), col(cls._W3)
        mpl, inv_tot = col(cls._MPL), col(cls._INVTOT)
        mp_frac, l, g = col(cls._MPFRAC), col(cls._L), col(cls._G)

        def accel_trig(s, c, thd, u):
            # (p̈, θ̈) — mirrors CartPoleDynamics.accel (models/cartpole.py),
            # on precomputed pole-angle trig
            a = (u + mpl * thd * thd * s) * inv_tot
            thdd = (g * s - c * a) / (l * (4.0 / 3.0 - mp_frac * c * c))
            pdd = a - mpl * thdd * c * inv_tot
            return pdd, thdd

        def state_cost(p, c_th, pd, thd):
            # the upright term consumes the CARRIED cos θ — no transcendental
            return (
                w0 * p * p + w1 * (1.0 - c_th)
                + w2 * pd * pd + w3 * thd * thd
            )

        def carry0():
            # carry = (p, sin θ, cos θ, ṗ, θ̇): θ itself is not carried —
            # dynamics and cost only ever consume its trig (round-5
            # trig-carry + Taylor-δ form: 5 transcendentals/step → 0, with
            # the 2 mass-matrix divides remaining; the angle-addition
            # identities and sub-ulp δ pairs are f32 rounding vs the twin)
            bc = lambda i: jnp.broadcast_to(col(i), (SUB, KB))  # noqa: E731
            th = bc(cls._X0TH)
            return (bc(cls._X0P), jnp.sin(th), jnp.cos(th), bc(cls._X0PD),
                    bc(cls._X0THD))

        def step(state, u_eff):
            p, s_th, c_th, pd, thd = state
            # RK2 midpoint — mirrors CartPoleDynamics.step exactly: stage 1
            # on the carried trig; θm = θ + δ1 (δ1 = θ̇·dt/2) by angle
            # addition; θ' = θm + δ2 (δ2 = θ̇·dt/2 + θ̈1·dt²/2) by a second
            pdd1, thdd1 = accel_trig(s_th, c_th, thd, u_eff)
            d1 = 0.5 * dt * thd
            # δ trig via the small-angle Taylor pair (|δ| ≲ 0.2 at
            # dt = 0.03 — see _sincos_small): zero transcendentals per
            # step beside the two mass-matrix divides
            s_d1, c_d1 = _sincos_small(d1)
            s_m = s_th * c_d1 + c_th * s_d1
            c_m = c_th * c_d1 - s_th * s_d1
            thd_m = thd + 0.5 * dt * thdd1
            pdd2, thdd2 = accel_trig(s_m, c_m, thd_m, u_eff)
            d2 = d1 + 0.5 * dt * dt * thdd1
            s_d2, c_d2 = _sincos_small(d2)
            pd_m = pd + 0.5 * dt * pdd1
            p = p + dt * pd_m
            s_th = s_m * c_d2 + c_m * s_d2
            c_th = c_m * c_d2 - s_m * s_d2
            pd = pd + dt * pdd2
            thd = thd + dt * thdd2
            return (p, s_th, c_th, pd, thd), state_cost(p, c_th, pd, thd)

        def final(state):
            p, s_th, c_th, pd, thd = state
            return state_cost(p, c_th, pd, thd)

        return carry0, step, final


class _LTIObstacleFamily(_LTIQuadFamily):
    """LTI point-mass + obstacle cost (ops/cost.py ObstacleCost): the
    quadratic family plus a per-step spherical-obstacle penalty. The
    indicator needs the per-group squared distance at STEP time (it is
    nonlinear, so it cannot ride the deferred per-group reduction); each
    obstacle costs one per-row diff² plus G small sublane sums per step.
    The obstacle count M is static in the plan (plan.extra), so the kernel
    carries exactly M obstacle terms — no padding loop."""

    name = "lti-obstacle"
    # columns: 0..7 = the LTI pack (sigma, inv_s, wq, wqd, gq, gqd, x0q,
    # x0qd — inherited constants), 8 = penalty, then per obstacle m:
    # 9+2m = center (group-tiled per-dim), 10+2m = radius² (uniform column)
    _PEN = 8

    @classmethod
    def np_cols(cls, plan) -> int:
        return 9 + 2 * plan.extra

    @staticmethod
    def plan_extra(cost) -> int:
        return int(cost.centers.shape[0])

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.point_mass import PointMassLTI
        from mppi_gpu_tpu.ops.cost import ObstacleCost

        return (
            isinstance(dyn, PointMassLTI)
            and type(cost) is ObstacleCost
            and type(cost.base) is QuadraticCost
            # obstacles live in position space with one coord per action dim
            and cost.centers.shape[-1] == dyn.action_dim
        )

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        base = _LTIQuadFamily.pack(dyn, cost.base, x0, sigma, plan, tileA)
        cols = [tileA(cost.penalty)]
        for m in range(plan.extra):
            cols.append(tileA(cost.centers[m]))
            cols.append(tileA(cost.radii[m] ** 2))
        return jnp.concatenate([base, jnp.stack(cols, axis=1)], axis=1)

    @classmethod
    def build(cls, p_ref, scal_ref, plan: "PallasPlan"):
        KB = plan.KB
        A, G, M = plan.A, plan.G, plan.extra
        carry0, lti_step, lti_final = _LTIQuadFamily.build(p_ref, scal_ref, plan)
        col = lambda i: p_ref[:, i:i + 1]  # noqa: E731
        pen = p_ref[0:1, cls._PEN:cls._PEN + 1]  # (1,1) uniform column
        zero_row = jnp.zeros((1, KB), jnp.float32)

        def obstacle_tile(q):
            """(SUB, KB) penalty contributions: row g*A carries group g's
            Σ_m penalty·[d²(q_g, c_m) < r_m²] (one row per group so the
            end-of-phase group reduction counts it once)."""
            hits = [jnp.zeros((1, KB), jnp.float32) for _ in range(G)]
            for m in range(M):
                c = col(9 + 2 * m)
                r2 = p_ref[0:1, 10 + 2 * m:11 + 2 * m]  # (1,1)
                d2 = (q - c) * (q - c)     # per-row (dim) contributions
                for g in range(G):
                    d2g = jnp.sum(d2[g * A:(g + 1) * A], axis=0, keepdims=True)
                    hits[g] = hits[g] + (d2g < r2).astype(jnp.float32)
            rows = []
            for g in range(G):
                rows.append(pen * hits[g])
                rows.extend([zero_row] * (A - 1))
            rows.extend([zero_row] * (SUB - G * A))
            return jnp.concatenate(rows, axis=0)

        def step(state, u_eff):
            state, c_state = lti_step(state, u_eff)
            return state, c_state + obstacle_tile(state[0])

        def final(state):
            return lti_final(state) + obstacle_tile(state[0])

        return carry0, step, final

    @classmethod
    def pack_planar(cls, dyn, cost, x0, sigma, plan):
        """Base LTI per-dim rows + obstacle columns (8 = penalty,
        9+2m = center_m[dim], 10+2m = radius_m² — scalars replicated)."""
        A = plan.A
        base = _LTIQuadFamily.pack_planar(dyn, cost.base, x0, sigma, plan)
        rep = lambda v: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(v, jnp.float32), (A,)
        )
        cols = [rep(cost.penalty)]
        for m in range(plan.extra):
            cols.append(cost.centers[m].astype(jnp.float32))
            cols.append(rep(cost.radii[m] ** 2))
        return jnp.concatenate([base, jnp.stack(cols, axis=1)], axis=1)

    @classmethod
    def build_planar(cls, p_at, scal_ref, plan: 'PallasPlan'):
        A, KB, M = plan.A, plan.KBp, plan.extra
        carry0, lti_step, lti_final = _LTIQuadFamily.build_planar(
            p_at, scal_ref, plan
        )
        pen = p_at(0, cls._PEN)

        def obstacle_cost(q):
            hits = jnp.zeros((SUB, KB), jnp.float32)
            for m in range(M):
                d2 = jnp.zeros((SUB, KB), jnp.float32)
                for i in range(A):
                    d = q[i] - p_at(i, 9 + 2 * m)
                    d2 = d2 + d * d
                hits = hits + (d2 < p_at(0, 10 + 2 * m)).astype(jnp.float32)
            return pen * hits

        def step(state, acts):
            state, c_state = lti_step(state, acts)
            return state, c_state + obstacle_cost(state[0])

        def final(state):
            return lti_final(state) + obstacle_cost(state[0])

        return carry0, step, final


class _QuadrotorFamily:
    """Planar quadrotor in mixer action space (models/quadrotor.py +
    ops/cost.py QuadrotorHoverCost): RK2-midpoint of the birotor ODE with
    the wrap-safe hover cost. First fused family with A=2 COUPLED action
    dims: rows g·2 / g·2+1 of the (SUB, KB) action tile carry group g's
    collective F and differential D, and the dynamics consumes both at
    once — each is duplicated onto both of its group's rows with static
    sublane slices (the same concat-of-slices pattern the generic phase's
    group reduction uses), the state integrates on full (SUB, KB) tiles,
    and an even-row mask zeroes the cost on rows g·2+1 so the end-of-phase
    per-group sublane reduction counts each group exactly once."""

    name = "quadrotor"
    NP = 19  # sigma, inv_s, w0..w5, goal_x, goal_z, x0 (6), 1/m, r/I, g
    _W0 = 2                      # ..7: w_px, w_pz, w_th, w_vx, w_vz, w_om
    _GX, _GZ = 8, 9
    _X0 = 10                     # ..15: px, pz, th, vx, vz, om
    _IM, _RI, _GRAV = 16, 17, 18
    # NOTE on tile layout: the state could live on one-row-per-group (G, KB)
    # tiles, but vregs are (8, 128) regardless — a (G, KB) array wastes half
    # of every vector op AND needs (1,1)→(G,KB) broadcasts, which Mosaic
    # rejects ("broadcast in both sublanes and lanes"). So the state stays
    # on full (SUB, KB) tiles with group g's value duplicated on rows
    # g·2/g·2+1 (same cost as computing half-empty tiles), every broadcast
    # is lane-only, and an even-row mask makes the shared per-group sublane
    # reduction count each group's cost exactly once.

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.quadrotor import QuadrotorDynamics
        from mppi_gpu_tpu.ops.cost import QuadrotorHoverCost

        return isinstance(dyn, QuadrotorDynamics) and type(cost) is QuadrotorHoverCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (6,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        cols = [tileA(sigma), tileA(cost.inv_s)]
        cols += [tileA(w[i]) for i in range(6)]
        cols += [tileA(cost.goal[0]), tileA(cost.goal[1])]
        cols += [tileA(x0[i]) for i in range(6)]
        cols += [
            tileA(1.0 / dyn.mass),
            tileA(dyn.arm / dyn.inertia),
            tileA(dyn.gravity),
        ]
        return jnp.stack(cols, axis=1)  # (SUB, NP)

    @classmethod
    def _core(cls, P, dt, KB: int):
        """Layout-agnostic physics/cost closures (see the unicycle family's
        _core for the P/acts conventions)."""
        w = [P(cls._W0 + i) for i in range(6)]
        gx, gz = P(cls._GX), P(cls._GZ)
        im, ri, grav = P(cls._IM), P(cls._RI), P(cls._GRAV)

        def accels_trig(s_th, c_th, F, D):
            # mirrors QuadrotorDynamics.accels exactly, on precomputed trig
            return F * s_th * im, F * c_th * im - grav, ri * D

        def state_cost(s):
            # the tilt term consumes the CARRIED cos θ — zero transcendentals
            px, pz, s_th, c_th, vx, vz, om = s
            dx, dz = px - gx, pz - gz
            return (
                w[0] * dx * dx + w[1] * dz * dz
                + w[2] * (1.0 - c_th)
                + w[3] * vx * vx + w[4] * vz * vz + w[5] * om * om
            )

        def carry0():
            # carry = (px, pz, sin θ, cos θ, vx, vz, ω): θ itself is not
            # carried — dynamics and cost only ever consume its trig
            # (round-5 trig-carry + Taylor-δ form: 5 transcendentals/step
            # → 0; the angle-addition identities and sub-ulp δ pairs are
            # f32 rounding vs the host twin's direct trig)
            bc = lambda v: jnp.broadcast_to(  # noqa: E731
                jnp.asarray(v, jnp.float32), (SUB, KB)
            )
            x = [bc(P(cls._X0 + i)) for i in range(6)]
            return (x[0], x[1], jnp.sin(x[2]), jnp.cos(x[2]), x[3], x[4], x[5])

        def step_core(state, acts):
            px, pz, s_th, c_th, vx, vz, om = state
            F, D = acts
            # RK2 midpoint — mirrors QuadrotorDynamics.step exactly: stage 1
            # on the carried trig; θm = θ + δ1 (δ1 = ω·dt/2) by angle
            # addition; θ' = θm + δ2 (δ2 = ω·dt/2 + α1·dt²/2 — the stage-1
            # angular acceleration enters here) by a second addition
            ax1, az1, al1 = accels_trig(s_th, c_th, F, D)
            d1 = 0.5 * dt * om
            # δ trig via the small-angle Taylor pair (|δ| ≲ 0.2 in any
            # reachable rollout at dt = 1/60 — see _sincos_small):
            # zero transcendentals per step
            s_d1, c_d1 = _sincos_small(d1)
            s_m = s_th * c_d1 + c_th * s_d1
            c_m = c_th * c_d1 - s_th * s_d1
            ax2, az2, al2 = accels_trig(s_m, c_m, F, D)
            d2 = d1 + 0.5 * dt * dt * al1
            s_d2, c_d2 = _sincos_small(d2)
            state = (
                px + dt * (vx + 0.5 * dt * ax1),
                pz + dt * (vz + 0.5 * dt * az1),
                s_m * c_d2 + c_m * s_d2,
                c_m * c_d2 - s_m * s_d2,
                vx + dt * ax2,
                vz + dt * az2,
                om + dt * al2,
            )
            return state, state_cost(state)

        def final_core(state):
            return state_cost(state)

        return carry0, step_core, final_core

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        G, KB = plan.G, plan.KB
        carry0, step_core, final_core = cls._core(
            lambda c: p_ref[:, c:c + 1], scal_ref[0, 0], KB
        )
        # even-row mask: group g's cost rides row g·2 only
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0)
        even = (row % 2 == 0).astype(jnp.float32)

        def pair_dup(u_eff, off):
            """(SUB, KB): rows g·2 and g·2+1 both carry group g's action
            row `off` (0 = collective F, 1 = differential D)."""
            rows = []
            for g in range(G):
                r = u_eff[g * 2 + off:g * 2 + off + 1]
                rows.append(r)
                rows.append(r)
            return jnp.concatenate(rows, axis=0)

        def step(state, u_eff):
            state, c = step_core(
                state, [pair_dup(u_eff, 0), pair_dup(u_eff, 1)]
            )
            return state, even * c

        def final(state):
            return even * final_core(state)

        return carry0, step, final

    @classmethod
    def pack_planar(cls, dyn, cost, x0, sigma, plan):
        x0 = jnp.broadcast_to(x0, (6,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        A = plan.A
        rep = lambda v: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(v, jnp.float32), (A,)
        )
        cols = [
            jnp.broadcast_to(sigma, (A,)).astype(jnp.float32),
            jnp.broadcast_to(cost.inv_s, (A,)).astype(jnp.float32),
        ]
        cols += [rep(w[i]) for i in range(6)]
        cols += [rep(cost.goal[0]), rep(cost.goal[1])]
        cols += [rep(x0[i]) for i in range(6)]
        cols += [rep(1.0 / dyn.mass), rep(dyn.arm / dyn.inertia), rep(dyn.gravity)]
        return jnp.stack(cols, axis=1)  # (A, NP)

    @classmethod
    def build_planar(cls, p_at, scal_ref, plan: 'PallasPlan'):
        return cls._core(lambda c: p_at(0, c), scal_ref[0, 0], plan.KBp)


class _UnicycleFamily:
    """Differential-drive unicycle + waypoint cost (models/unicycle.py +
    ops/cost.py UnicycleWaypointCost): RK2-midpoint of the planar-pose
    kinematics with the wrap-safe face-the-goal bearing term. A=2 COUPLED
    action dims (v, ω) → G=4 rollout groups per tile, each group's two
    action rows duplicated onto both of its rows (the quadrotor family's
    pair_dup pattern).

    Trig-carry form (round 5, the arm family's pattern): the naive step
    needs FIVE transcendentals — sin/cos of the midpoint heading for the
    dynamics, sin/cos of the NEW heading for the bearing cost, and the
    bearing rsqrt. Instead the heading's (sin, cos) ride the loop carry
    (θ itself is not carried — nothing consumes it), and each step
    computes only the trig of the half-increment δ = ω·dt/2 — via the
    small-angle Taylor pair (`_sincos_small`; |δ| ≤ ~0.21, ω noise-capped
    by the Box-Muller 5.8σ radius); the midpoint trig is one
    angle-addition from the carried trig, the new-state trig a second
    angle-addition by the same δ (θ' = θm + δ exactly, since the heading
    rate is constant within a step), and the cost consumes the carried
    trig for free → ZERO range-reduced transcendentals + 1 rsqrt per step
    (measured 3.27 → 2.45 → 1.07 ms at K=10⁵, T=200 across the round-5
    steps). The identities and the sub-ulp Taylor pairs introduce only
    f32 rounding vs the host twin's direct sin(θm)/sin(θ') (random-walk
    drift ~1e-6 over T=200, inside every oracle tolerance)."""

    name = "unicycle"
    NP = 9  # sigma, inv_s, w_pos, w_head, gx, gy, x0 px/py/θ
    _WPOS, _WHEAD, _GX, _GY, _X0 = 2, 3, 4, 5, 6

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.unicycle import UnicycleDynamics
        from mppi_gpu_tpu.ops.cost import UnicycleWaypointCost

        return isinstance(dyn, UnicycleDynamics) and type(cost) is UnicycleWaypointCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (3,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        return jnp.stack(
            [
                tileA(sigma), tileA(cost.inv_s),
                tileA(w[0]), tileA(w[1]), tileA(g[0]), tileA(g[1]),
                tileA(x0[0]), tileA(x0[1]), tileA(x0[2]),
            ],
            axis=1,
        )  # (SUB, NP)

    @classmethod
    def _core(cls, P, dt, KB: int):
        """Layout-agnostic physics/cost closures. `P(col)` yields a parameter
        as a scalar (planar SMEM) or an (SUB, 1) column (row-packed VMEM) —
        both broadcast identically against (SUB, KB) tiles. `step_core`
        consumes the per-dim effective actions as a LIST of (SUB, KB) tiles
        and returns the UNMASKED per-element state cost; the layout wrappers
        add action extraction (pair_dup) and group masking."""
        w_pos, w_head = P(cls._WPOS), P(cls._WHEAD)
        gx, gy = P(cls._GX), P(cls._GY)

        def state_cost(px, py, s_th, c_th):
            # mirrors UnicycleWaypointCost._state exactly (incl. the 1e-3 ε);
            # the heading trig comes from the carry — zero transcendentals
            dx, dy = gx - px, gy - py
            d2 = dx * dx + dy * dy
            align = (dx * c_th + dy * s_th) * jax.lax.rsqrt(d2 + 1e-3)
            return w_pos * d2 + w_head * (1.0 - align)

        def carry0():
            # carry = (px, py, sin θ, cos θ): θ itself is not carried —
            # dynamics and cost only ever consume its trig
            bc = lambda v: jnp.broadcast_to(  # noqa: E731
                jnp.asarray(v, jnp.float32), (SUB, KB)
            )
            th = bc(P(cls._X0 + 2))
            return (bc(P(cls._X0)), bc(P(cls._X0 + 1)), jnp.sin(th), jnp.cos(th))

        def step_core(state, acts):
            px, py, s_th, c_th = state
            v, om = acts
            # δ = ω·dt/2: bounded small (|δ| ≤ ~0.21 — ω is noise-capped by
            # the 5.8σ Box-Muller radius), so its trig is the small-angle
            # Taylor pair; midpoint and new-state headings are
            # angle-additions (θm = θ+δ, θ' = θm+δ) — mirrors
            # UnicycleDynamics.step's RK2 midpoint to f32 rounding
            # (zero transcendentals per step beside the bearing rsqrt)
            d = 0.5 * dt * om
            s_d, c_d = _sincos_small(d)
            s_m = s_th * c_d + c_th * s_d
            c_m = c_th * c_d - s_th * s_d
            s_n = s_m * c_d + c_m * s_d
            c_n = c_m * c_d - s_m * s_d
            state = (px + dt * v * c_m, py + dt * v * s_m, s_n, c_n)
            return state, state_cost(*state)

        def final_core(state):
            return state_cost(*state)

        return carry0, step_core, final_core

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        G, KB = plan.G, plan.KB
        carry0, step_core, final_core = cls._core(
            lambda c: p_ref[:, c:c + 1], scal_ref[0, 0], KB
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0)
        even = (row % 2 == 0).astype(jnp.float32)

        def pair_dup(u_eff, off):
            rows = []
            for g in range(G):
                r = u_eff[g * 2 + off:g * 2 + off + 1]
                rows.append(r)
                rows.append(r)
            return jnp.concatenate(rows, axis=0)

        def step(state, u_eff):
            state, c = step_core(
                state, [pair_dup(u_eff, 0), pair_dup(u_eff, 1)]
            )
            return state, even * c

        def final(state):
            return even * final_core(state)

        return carry0, step, final

    @classmethod
    def pack_planar(cls, dyn, cost, x0, sigma, plan):
        """(A, NP) per-dim parameter rows for the planar kernels: cols 0/1 =
        per-dim σ/Σ⁻¹ (read by the shared phases), family scalars replicated
        across rows at the SAME column indices the row-packed pack uses."""
        x0 = jnp.broadcast_to(x0, (3,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        A = plan.A
        rep = lambda v: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(v, jnp.float32), (A,)
        )
        return jnp.stack(
            [
                jnp.broadcast_to(sigma, (A,)).astype(jnp.float32),
                jnp.broadcast_to(cost.inv_s, (A,)).astype(jnp.float32),
                rep(w[0]), rep(w[1]), rep(g[0]), rep(g[1]),
                rep(x0[0]), rep(x0[1]), rep(x0[2]),
            ],
            axis=1,
        )  # (A, NP)

    @classmethod
    def build_planar(cls, p_at, scal_ref, plan: 'PallasPlan'):
        """Planar (state-planar) form: rows are 8 WHOLE rollouts, the A=2
        effective-action tiles arrive as a list — no pair_dup, no group
        mask, and the dynamics/cost run at 1× instead of the row-packed
        form's 2× group duplication (round 5; docs/kernels.md)."""
        carry0, step_core, final_core = cls._core(
            lambda c: p_at(0, c), scal_ref[0, 0], plan.KBp
        )
        return carry0, step_core, final_core


class _ArmFamily:
    """Two-link planar manipulator + reach cost (models/arm.py +
    ops/cost.py ArmReachCost): RK2-midpoint of the manipulator equations
    with the closed-form 2×2 mass-matrix inverse and joint-rate saturation
    after each stage, plus the end-effector reach cost. A=2 COUPLED action
    dims (τ1, τ2) → G=4 rollout groups per tile in the row-packed form
    (pair_dup pattern); the first family with a configuration-dependent
    mass matrix. Naively the most trig-heavy step in the registry — 12
    transcendentals (4 trig × 2 RK2 stages + 4 for the cost FK) — reduced
    in round 5 to ZERO range-reduced transcendentals: both joint angles
    leave the carry entirely (every consumer reads their trig, advanced by
    small-angle Taylor-δ additions, |δ| ≤ max_rate·dt = 0.2 strictly via
    the rate saturation; see `_sincos_small`), with one reciprocal per
    RK2 stage remaining. Measured 10.2 (naive) → 6.75 (carried trig) →
    3.75 (state-planar) → 1.75 ms (Taylor δ) at K=10⁵, T=200."""

    name = "arm"
    NP = 19  # sigma, inv_s, w_pos, w_vel, tx, ty, A, B, D, G1, G2,
    #          damping, max_rate, l1, l2, x0 (4)
    _WPOS, _WVEL, _TX, _TY = 2, 3, 4, 5
    _A, _B, _D, _G1, _G2, _DAMP, _MAXR, _L1, _L2, _X0 = (
        6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    )

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.arm import TwoLinkArmDynamics
        from mppi_gpu_tpu.ops.cost import ArmReachCost

        return isinstance(dyn, TwoLinkArmDynamics) and type(cost) is ArmReachCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (4,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        return jnp.stack(
            [
                tileA(sigma), tileA(cost.inv_s),
                tileA(w[0]), tileA(w[1]), tileA(g[0]), tileA(g[1]),
                tileA(dyn.A), tileA(dyn.B), tileA(dyn.D),
                tileA(dyn.G1), tileA(dyn.G2),
                tileA(dyn.damping), tileA(dyn.max_rate),
                # FK link lengths come from the COST (the kernel's l1/l2 feed
                # only state_cost): ArmReachCost._state uses cost.l1/cost.l2,
                # which may differ from the dynamics' lengths if a user mixes
                # defaults — the kernel must mirror the scan cost exactly.
                tileA(cost.l1), tileA(cost.l2),
                tileA(x0[0]), tileA(x0[1]), tileA(x0[2]), tileA(x0[3]),
            ],
            axis=1,
        )  # (SUB, NP)

    @classmethod
    def _core(cls, P, dt, KB: int):
        """Layout-agnostic physics/cost closures (see the unicycle family's
        _core for the P/acts conventions)."""
        w_pos, w_vel = P(cls._WPOS), P(cls._WVEL)
        tx, ty = P(cls._TX), P(cls._TY)
        A_, B_, D_ = P(cls._A), P(cls._B), P(cls._D)
        g1, g2 = P(cls._G1), P(cls._G2)
        damp, maxr = P(cls._DAMP), P(cls._MAXR)
        l1, l2 = P(cls._L1), P(cls._L2)

        def trig_of(q1, q2):
            return jnp.sin(q1), jnp.cos(q1), jnp.sin(q2), jnp.cos(q2)

        def deriv(qd1, qd2, t1, t2, trig):
            # mirrors TwoLinkArmDynamics._deriv, with cos(q1+q2) expanded by
            # the angle-addition identity on the already-computed per-joint
            # trig (saves one transcendental per stage; |identity − direct|
            # is f32 rounding, inside every host-twin tolerance)
            s1, c1, s2, c2 = trig
            c12 = c1 * c2 - s1 * s2
            d11 = A_ + 2.0 * B_ * c2
            d12 = D_ + B_ * c2
            hs = B_ * s2
            r1 = t1 + hs * (2.0 * qd1 * qd2 + qd2 * qd2) \
                - (g1 * c1 + g2 * c12) - damp * qd1
            r2 = t2 - hs * qd1 * qd1 - g2 * c12 - damp * qd2
            inv_det = 1.0 / (d11 * D_ - d12 * d12)
            qdd1 = (D_ * r1 - d12 * r2) * inv_det
            qdd2 = (d11 * r2 - d12 * r1) * inv_det
            return qdd1, qdd2

        def sat(qd):
            return jnp.clip(qd, -maxr, maxr)

        def state_cost(qd1, qd2, trig):
            # mirrors ArmReachCost._state: the forward kinematics reuse the
            # carried state trig (angle addition for the q1+q2 terms), so
            # the cost costs ZERO transcendentals
            s1, c1, s2, c2 = trig
            c12 = c1 * c2 - s1 * s2
            s12 = s1 * c2 + c1 * s2
            ex = l1 * c1 + l2 * c12
            ey = l1 * s1 + l2 * s12
            dx, dy = ex - tx, ey - ty
            vel = qd1 * qd1 + qd2 * qd2
            return w_pos * (dx * dx + dy * dy) + w_vel * vel

        def rot(s, c, s_d, c_d):
            # angle addition: trig of (θ + δ) from trig of θ and of δ
            return s * c_d + c * s_d, c * c_d - s * s_d

        def carry0():
            # carry = (qd1, qd2, s1, c1, s2, c2): the joint ANGLES are not
            # carried at all — every consumer (dynamics stages, FK cost)
            # reads their trig, which advances by small-angle-δ additions
            # (|δ| ≤ max_rate·dt = 0.2, strictly bounded by the rate
            # saturation — see _sincos_small). 12 transcendentals/step
            # naively → 8 (carried trig, round 5a) → 0 (poly-δ, round 5b).
            bc = lambda v: jnp.broadcast_to(  # noqa: E731
                jnp.asarray(v, jnp.float32), (SUB, KB)
            )
            q = [bc(P(cls._X0 + i)) for i in range(4)]
            return (q[2], q[3], *trig_of(q[0], q[1]))

        def step_core(state, acts):
            qd1, qd2 = state[:2]
            trig = state[2:]
            s1, c1, s2, c2 = trig
            t1, t2 = acts
            # RK2 midpoint + rate saturation after each stage — mirrors
            # TwoLinkArmDynamics.step to f32 rounding (midpoint/new-state
            # trig by angle addition with Taylor-δ pairs)
            qdd1, qdd2 = deriv(qd1, qd2, t1, t2, trig)
            sd1, cd1 = _sincos_small(0.5 * dt * qd1)
            sd2, cd2 = _sincos_small(0.5 * dt * qd2)
            trig_m = (*rot(s1, c1, sd1, cd1), *rot(s2, c2, sd2, cd2))
            qd1m = sat(qd1 + 0.5 * dt * qdd1)
            qd2m = sat(qd2 + 0.5 * dt * qdd2)
            qdd1m, qdd2m = deriv(qd1m, qd2m, t1, t2, trig_m)
            sn1, cn1 = _sincos_small(dt * qd1m)
            sn2, cn2 = _sincos_small(dt * qd2m)
            trig_n = (*rot(s1, c1, sn1, cn1), *rot(s2, c2, sn2, cn2))
            qd1n = sat(qd1 + dt * qdd1m)
            qd2n = sat(qd2 + dt * qdd2m)
            state = (qd1n, qd2n, *trig_n)
            return state, state_cost(qd1n, qd2n, trig_n)

        def final_core(state):
            return state_cost(state[0], state[1], state[2:])

        return carry0, step_core, final_core

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        G, KB = plan.G, plan.KB
        carry0, step_core, final_core = cls._core(
            lambda c: p_ref[:, c:c + 1], scal_ref[0, 0], KB
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0)
        even = (row % 2 == 0).astype(jnp.float32)

        def pair_dup(u_eff, off):
            rows = []
            for g in range(G):
                r = u_eff[g * 2 + off:g * 2 + off + 1]
                rows.append(r)
                rows.append(r)
            return jnp.concatenate(rows, axis=0)

        def step(state, u_eff):
            state, c = step_core(
                state, [pair_dup(u_eff, 0), pair_dup(u_eff, 1)]
            )
            return state, even * c

        def final(state):
            return even * final_core(state)

        return carry0, step, final

    @classmethod
    def pack_planar(cls, dyn, cost, x0, sigma, plan):
        x0 = jnp.broadcast_to(x0, (4,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        A = plan.A
        rep = lambda v: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(v, jnp.float32), (A,)
        )
        return jnp.stack(
            [
                jnp.broadcast_to(sigma, (A,)).astype(jnp.float32),
                jnp.broadcast_to(cost.inv_s, (A,)).astype(jnp.float32),
                rep(w[0]), rep(w[1]), rep(g[0]), rep(g[1]),
                rep(dyn.A), rep(dyn.B), rep(dyn.D),
                rep(dyn.G1), rep(dyn.G2),
                rep(dyn.damping), rep(dyn.max_rate),
                # FK link lengths from the COST (host-twin invariant — the
                # kernel's l1/l2 feed only state_cost; see pack)
                rep(cost.l1), rep(cost.l2),
                rep(x0[0]), rep(x0[1]), rep(x0[2]), rep(x0[3]),
            ],
            axis=1,
        )  # (A, NP)

    @classmethod
    def build_planar(cls, p_at, scal_ref, plan: 'PallasPlan'):
        return cls._core(lambda c: p_at(0, c), scal_ref[0, 0], plan.KBp)


class _Quadrotor3DFamily:
    """Full 3-D quadrotor, quaternion SE(3) rigid body in mixer action
    space (models/quadrotor3d.py + ops/cost.py Quadrotor3DHoverCost):
    RK2-midpoint of the 13-state ODE with the yaw-invariant hover cost.
    A=4 COUPLED action dims → G=2 rollout groups per tile; each of the
    group's four action rows (F, τx, τy, τz) is duplicated onto all four
    of its group's rows (the same static concat-of-slices pattern as the
    planar family's pair_dup), the 13 state components live on 13 full
    (SUB, KB) register tiles, and a row%4==0 mask makes the per-group
    sublane reduction count each group's cost exactly once. The step is
    polynomial + one rsqrt (quaternion renorm) — NO transcendentals, so
    despite 13 state tiles this family is cheap on the VPU."""

    name = "quadrotor3d"
    NP = 37
    _W0 = 2                      # ..9: w_px..w_om (8)
    _GP = 10                     # ..12: goal px, py, pz
    _GV = 13                     # ..15: goal vx, vy, vz
    _X0 = 16                     # ..28: x0 (13)
    _IM, _GRAV = 29, 30
    _IJ = 31                     # ..33: 1/Jx, 1/Jy, 1/Jz
    _CJ = 34                     # ..36: Jz−Jy, Jx−Jz, Jy−Jx

    @staticmethod
    def supports(dyn, cost) -> bool:
        from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics
        from mppi_gpu_tpu.ops.cost import Quadrotor3DHoverCost

        return isinstance(dyn, Quadrotor3DDynamics) and type(cost) is Quadrotor3DHoverCost

    @classmethod
    def pack(cls, dyn, cost, x0, sigma, plan, tileA):
        x0 = jnp.broadcast_to(x0, (13,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        jx, jy, jz = dyn.inertia[0], dyn.inertia[1], dyn.inertia[2]
        cols = [tileA(sigma), tileA(cost.inv_s)]
        cols += [tileA(w[i]) for i in range(8)]
        cols += [tileA(g[i]) for i in range(3)]       # goal position
        cols += [tileA(g[7 + i]) for i in range(3)]   # goal velocity
        cols += [tileA(x0[i]) for i in range(13)]
        cols += [tileA(1.0 / dyn.mass), tileA(dyn.gravity)]
        cols += [tileA(1.0 / jx), tileA(1.0 / jy), tileA(1.0 / jz)]
        cols += [tileA(jz - jy), tileA(jx - jz), tileA(jy - jx)]
        return jnp.stack(cols, axis=1)  # (SUB, NP)

    @classmethod
    def _core(cls, P, dt, KB: int):
        """Layout-agnostic physics/cost closures (see the unicycle family's
        _core for the P/acts conventions)."""
        w = [P(cls._W0 + i) for i in range(8)]
        gp = [P(cls._GP + i) for i in range(3)]
        gv = [P(cls._GV + i) for i in range(3)]
        im, grav = P(cls._IM), P(cls._GRAV)
        ij = [P(cls._IJ + i) for i in range(3)]
        cj = [P(cls._CJ + i) for i in range(3)]

        def derivs(q, v, om, F, TX, TY, TZ):
            # mirrors Quadrotor3DDynamics.derivs exactly (im/ij/cj packed
            # as reciprocals/differences so there are no divides)
            qw, qx, qy, qz = q
            wx, wy, wz = om
            fm = F * im
            acc = (
                2.0 * (qx * qz + qw * qy) * fm,
                2.0 * (qy * qz - qw * qx) * fm,
                (1.0 - 2.0 * (qx * qx + qy * qy)) * fm - grav,
            )
            qdot = (
                -0.5 * (qx * wx + qy * wy + qz * wz),
                0.5 * (qw * wx + qy * wz - qz * wy),
                0.5 * (qw * wy + qz * wx - qx * wz),
                0.5 * (qw * wz + qx * wy - qy * wx),
            )
            omdot = (
                (TX - cj[0] * wy * wz) * ij[0],
                (TY - cj[1] * wz * wx) * ij[1],
                (TZ - cj[2] * wx * wy) * ij[2],
            )
            return qdot, acc, omdot

        def state_cost(s):
            p, q, v, om = s[0:3], s[3:7], s[7:10], s[10:13]
            dp = [p[i] - gp[i] for i in range(3)]
            dv = [v[i] - gv[i] for i in range(3)]
            c = w[0] * dp[0] * dp[0] + w[1] * dp[1] * dp[1] + w[2] * dp[2] * dp[2]
            c = c + w[3] * (2.0 * (q[1] * q[1] + q[2] * q[2]))
            c = c + w[4] * dv[0] * dv[0] + w[5] * dv[1] * dv[1] + w[6] * dv[2] * dv[2]
            c = c + w[7] * (om[0] * om[0] + om[1] * om[1] + om[2] * om[2])
            return c

        def carry0():
            bc = lambda v: jnp.broadcast_to(  # noqa: E731
                jnp.asarray(v, jnp.float32), (SUB, KB)
            )
            return tuple(bc(P(cls._X0 + i)) for i in range(13))

        def step_core(state, acts):
            p, q = state[0:3], state[3:7]
            v, om = state[7:10], state[10:13]
            F, TX, TY, TZ = acts
            # RK2 midpoint — mirrors Quadrotor3DDynamics.step exactly
            qd1, a1, wd1 = derivs(q, v, om, F, TX, TY, TZ)
            q_m = tuple(q[i] + 0.5 * dt * qd1[i] for i in range(4))
            v_m = tuple(v[i] + 0.5 * dt * a1[i] for i in range(3))
            om_m = tuple(om[i] + 0.5 * dt * wd1[i] for i in range(3))
            qd2, a2, wd2 = derivs(q_m, v_m, om_m, F, TX, TY, TZ)
            q_n = tuple(q[i] + dt * qd2[i] for i in range(4))
            inv = jax.lax.rsqrt(
                q_n[0] * q_n[0] + q_n[1] * q_n[1]
                + q_n[2] * q_n[2] + q_n[3] * q_n[3]
            )
            state = (
                p[0] + dt * v_m[0], p[1] + dt * v_m[1], p[2] + dt * v_m[2],
                q_n[0] * inv, q_n[1] * inv, q_n[2] * inv, q_n[3] * inv,
                v[0] + dt * a2[0], v[1] + dt * a2[1], v[2] + dt * a2[2],
                om[0] + dt * wd2[0], om[1] + dt * wd2[1], om[2] + dt * wd2[2],
            )
            return state, state_cost(state)

        def final_core(state):
            return state_cost(state)

        return carry0, step_core, final_core

    @classmethod
    def build(cls, p_ref, scal_ref, plan: 'PallasPlan'):
        G, KB = plan.G, plan.KB
        carry0, step_core, final_core = cls._core(
            lambda c: p_ref[:, c:c + 1], scal_ref[0, 0], KB
        )
        # first-row-of-group mask: group g's cost rides row g·4 only
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0)
        first = (row % 4 == 0).astype(jnp.float32)

        def quad_dup(u_eff, off):
            """(SUB, KB): all four rows of group g carry its action row
            `off` (0=F, 1=τx, 2=τy, 3=τz)."""
            rows = []
            for g in range(G):
                r = u_eff[g * 4 + off:g * 4 + off + 1]
                rows.extend([r, r, r, r])
            return jnp.concatenate(rows, axis=0)

        def step(state, u_eff):
            state, c = step_core(
                state, [quad_dup(u_eff, off) for off in range(4)]
            )
            return state, first * c

        def final(state):
            return first * final_core(state)

        return carry0, step, final

    @classmethod
    def pack_planar(cls, dyn, cost, x0, sigma, plan):
        x0 = jnp.broadcast_to(x0, (13,)).astype(jnp.float32)
        w = cost.w.astype(jnp.float32)
        g = cost.goal.astype(jnp.float32)
        jx, jy, jz = dyn.inertia[0], dyn.inertia[1], dyn.inertia[2]
        A = plan.A
        rep = lambda v: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(v, jnp.float32), (A,)
        )
        cols = [
            jnp.broadcast_to(sigma, (A,)).astype(jnp.float32),
            jnp.broadcast_to(cost.inv_s, (A,)).astype(jnp.float32),
        ]
        cols += [rep(w[i]) for i in range(8)]
        cols += [rep(g[i]) for i in range(3)]
        cols += [rep(g[7 + i]) for i in range(3)]
        cols += [rep(x0[i]) for i in range(13)]
        cols += [rep(1.0 / dyn.mass), rep(dyn.gravity)]
        cols += [rep(1.0 / jx), rep(1.0 / jy), rep(1.0 / jz)]
        cols += [rep(jz - jy), rep(jx - jz), rep(jy - jx)]
        return jnp.stack(cols, axis=1)  # (A, NP)

    @classmethod
    def build_planar(cls, p_at, scal_ref, plan: 'PallasPlan'):
        return cls._core(lambda c: p_at(0, c), scal_ref[0, 0], plan.KBp)


FAMILIES = {
    f.name: f
    for f in (
        _LTIQuadFamily, _PendulumFamily, _CartPoleFamily, _LTIObstacleFamily,
        _QuadrotorFamily, _Quadrotor3DFamily, _UnicycleFamily, _ArmFamily,
    )
}

# Families with a planar-layout (dims-on-tiles) one-pass kernel whose
# dynamics are elementwise per action dim — each dim integrates on its own
# (SUB, KB) tile; planar pays only when SUB % A != 0 (sublane pad waste).
PLANAR_FAMILIES = ("lti", "lti-obstacle")

# COUPLED families with a state-planar one-pass kernel (round 5): rows are
# whole rollouts, the per-component state tiles couple elementwise across
# tiles, and the A effective-action tiles arrive as a list — eliminating
# the row-packed layout's A× group-duplication of every dynamics/cost op
# (the reason the tiled SCAN beat the fused quadrotor3d kernel in the
# round-5 table). Planar always pays here; extended as each family gains
# build_planar/pack_planar.
COUPLED_PLANAR_FAMILIES = ("unicycle", "quadrotor", "arm", "quadrotor3d")

_BUILTIN_FAMILIES = frozenset(FAMILIES)


def register_family(cls):
    """Register an out-of-tree fused (dynamics, cost) family with the Pallas
    backend (usable as a class decorator).

    A family teaches the fused kernels one (dynamics, cost) pair: it
    contributes ONLY the per-step state integration + state-cost tile math
    (pure elementwise ops on ``(SUB, KB)`` f32 tiles) and its parameter
    packing. Everything else — on-chip noise generation, nominal-U
    extraction, K-masking, the online softmin, the weighted update, one-pass
    ε staging, fleet batching and mesh sharding — is shared machinery and
    comes for free. After registration the ``'auto'`` backend resolves the
    pair to the fused Pallas path on TPU exactly like the built-in eight
    (this is the kernel-side twin of :func:`mppi_gpu_tpu.ops.cost.register_cost`
    and the models' ``Dynamics`` protocol, which extend the scan path).

    Required protocol (worked template: docs/extending.md; complete
    out-of-tree family: examples/custom_family.py; verification pattern:
    tests/test_custom_family.py):

    * ``name: str`` — unique family name.
    * ``NP: int`` — parameter-pack column count (or classmethod
      ``np_cols(plan) -> int`` when it depends on ``plan.extra``).
    * ``supports(dyn, cost) -> bool`` — does this family fuse the pair?
      Match YOUR concrete types; first matching family wins in
      :func:`family_for`.
    * ``pack(dyn, cost, x0, sigma, plan, tileA) -> (SUB, NP) f32`` — the
      parameter matrix, built host-side (traced) once per solve. Columns 0
      and 1 MUST be ``tileA(sigma)`` and ``tileA(cost.inv_s)`` (the shared
      phases read them); ``tileA`` maps an ``(A,)`` vector to a group-tiled
      ``(SUB,)`` column (row ``g*A+i`` = value for action dim ``i``).
    * ``build(p_ref, scal_ref, plan) -> (carry0, step, final)`` —
      kernel-side closures over ``(SUB, plan.KB)`` tiles:
      ``carry0() -> state`` (a tuple of tiles, typically broadcast from x0
      columns of ``p_ref``); ``step(state, u_eff) -> (state', c)`` where
      ``u_eff`` is the group-tiled ``u_t + ε_t`` tile and ``c`` the per-row
      state-cost increment evaluated on ``x_{t+1}`` (the shared phase adds
      the generic ``λ·uᵀΣ⁻¹ε`` control term); ``final(state) -> c``.
      ``scal_ref[0, 0]`` is dt. Two hard rules: (1) ``step`` must mirror the
      scan-path ``Dynamics.step`` exactly (same integrator, same constants)
      so the host-twin oracle holds; (2) the per-group sublane reduction
      sums each group's A rows, so a family with A > 1 must count its state
      cost ONCE per group (mask all but one row — see the unicycle family's
      ``even`` mask) while per-dim terms may ride their own rows.

    Optional: ``plan_extra(cost) -> int`` — a static per-cost size (e.g. an
    obstacle count) stored as ``plan.extra`` and consumed by ``np_cols``.

    Optional (state-planar form): ``pack_planar(dyn, cost, x0, sigma, plan)
    -> (A, NP) f32`` (cols 0/1 per-dim σ/Σ⁻¹, family scalars replicated
    across rows) + ``build_planar(p_at, scal_ref, plan) -> (carry0, step,
    final)`` where ``step(state, acts)`` takes the A effective-action
    tiles as a LIST and returns the UNMASKED (SUB, plan.KBp) cost — rows
    are whole rollouts, no group duplication/masking. Registering the name
    in ``COUPLED_PLANAR_FAMILIES`` (built-ins) opts the one-pass core into
    it; the built-in coupled families implement both layouts from one
    layout-agnostic ``_core`` so the physics cannot drift (round 5,
    docs/kernels.md "State-planar for COUPLED families").

    Overriding a built-in family name raises ValueError; re-registering a
    user family (module re-import) silently replaces the previous class.
    """
    for attr in ("name", "supports", "pack", "build"):
        if not hasattr(cls, attr):
            raise TypeError(
                f"fused family {cls!r} lacks required attribute '{attr}'"
            )
    if not isinstance(cls.name, str) or not cls.name:
        raise TypeError(f"fused family {cls!r}: 'name' must be a non-empty str")
    if not hasattr(cls, "NP") and not hasattr(cls, "np_cols"):
        raise TypeError(
            f"fused family '{cls.name}' needs an NP column count or np_cols(plan)"
        )
    if cls.name in _BUILTIN_FAMILIES:
        raise ValueError(f"cannot override built-in fused family '{cls.name}'")
    FAMILIES[cls.name] = cls
    return cls


def unregister_family(name: str) -> None:
    """Remove a user-registered family (test hygiene). Built-ins are
    permanent."""
    if name in _BUILTIN_FAMILIES:
        raise ValueError(f"cannot unregister built-in fused family '{name}'")
    FAMILIES.pop(name, None)


def _np_cols(fam, plan: "PallasPlan") -> int:
    """Parameter-pack width for this plan (families with variable-size
    parameter sets — the obstacle list — override np_cols)."""
    return fam.np_cols(plan) if hasattr(fam, "np_cols") else fam.NP


def _plan_extra(fam, cost) -> int:
    return fam.plan_extra(cost) if hasattr(fam, "plan_extra") else 0


def family_for(dyn, cost) -> str:
    """Fused-family name for a (dynamics, cost) pair, or TypeError — the
    dispatch behind the 'auto' backend resolution."""
    for fam in FAMILIES.values():
        if fam.supports(dyn, cost):
            return fam.name
    raise TypeError(
        "pallas rollout backend fuses "
        + ", ".join(f"({f.name})" for f in FAMILIES.values())
        + f"; got ({type(dyn).__name__}, {type(cost).__name__}) — use "
        "rollout_backend='scan' for custom models"
    )


def _rollout_phase_S(tile_i, seeds, scal_ref, u_ref, p_ref, plan: PallasPlan,
                     eps_out=None, u3_at=None):
    """Seed tile `tile_i`'s PRNG stream, roll out its G·KB rollouts over T,
    and return the K-masked (G, KB) cost tile. The SINGLE implementation of
    the rollout-cost phase, shared by kernel A, the fused kernels (two-pass
    AND one-pass) and the fleet kernel — the execution modes must stay
    bit-identical. Generic over the fused family (plan.family): the family
    supplies the state integration and state-cost tile math; everything else
    is shared. `seeds` = (seed0, seed1, Ktrue) int32 scalars (the fleet
    kernel passes its robot's row); `u_ref`/`p_ref` may be VMEM refs OR
    loaded arrays — both are only read via slicing. `eps_out` (one-pass
    mode) is a (Tc, SUB, KB) VMEM stage buffer the consumed ε is written to.
    `u3_at`, when given, is a callable t → (SUB, LANE) row of a
    lane-replicated U table: step t's action column is then a dynamic
    leading-dim load instead of the one-hot lane extraction — same exact
    values (both yield U[t,i] exactly, so S stays bit-identical across
    modes), measured ~0.3 ms cheaper per solve at T=200, K=10⁵
    (docs/kernels.md roofline)."""
    A, G, KB, Tpad = plan.A, plan.G, plan.KB, plan.Tpad
    fam = FAMILIES[plan.family]
    seed0, seed1, k_true = seeds
    _seed(seed0, seed1, tile_i)
    lam = scal_ref[0, 1]
    u_all = u_ref[:, :]
    sigma = p_ref[:, _P_SIGMA:_P_SIGMA + 1]
    lam_invs = lam * p_ref[:, _P_INVS:_P_INVS + 1]
    carry0, fam_step, fam_final = fam.build(p_ref, scal_ref, plan)
    sid = _kernel_sid(seed0, plan)

    def body(t, carry):
        state, acc, e_prev = carry
        eps, e_prev = _next_eps(t, e_prev, sigma, scal_ref, KB, plan.anti, plan.ou, tile_i, plan.testmode, sid)
        if eps_out is not None:
            # antithetic: stage only ε⁺ (mirrors are exact negatives; the
            # update folds them as (w⁺ − w⁻)·ε⁺) — halves stage VMEM
            eps_out[t] = eps[:, : KB // 2] if plan.anti else eps
        if u3_at is not None:
            u_b = jnp.broadcast_to(u3_at(t)[:, 0:1], (SUB, KB))
        else:
            u_t = jnp.sum(u_all * _onehot_lanes(t, Tpad), axis=1, keepdims=True)
            u_b = jnp.broadcast_to(u_t, (SUB, KB))
        state, c_state = fam_step(state, u_b + eps)
        # step cost on x_{t+1}: state part from the family + the generic
        # λ·uᵀΣ⁻¹ε control term, accumulated ELEMENTWISE — the per-group
        # sublane reduction is deferred to phase end
        acc = acc + (lam_invs * u_b) * eps + c_state
        return state, acc, e_prev

    zero = jnp.zeros((SUB, KB), jnp.float32)
    state, acc, _ = jax.lax.fori_loop(0, plan.T, body, (carry0(), zero, zero))
    acc = acc + fam_final(state)
    # per-group sublane reduction: S_g = Σ_{rows g*A..g*A+A-1} acc
    S = jnp.concatenate(
        [jnp.sum(acc[g * A:(g + 1) * A], axis=0, keepdims=True) for g in range(G)],
        axis=0,
    )  # (G, KB)
    # mask rollouts beyond the true K so their softmin weight underflows to 0
    # (rank-based: never splits an antithetic mirror pair)
    return jnp.where(_lane_rank(plan, tile_i) < k_true, S, jnp.float32(BIG))


def _online_softmin_step(S, lam, run_scr, acc_scr, contrib):
    """One tile of the online softmin shared by ALL one-pass kernels
    (single-robot / planar / both fleet forms — they must stay
    mathematically identical): fold this tile's K-masked cost tile S and
    its unnormalized weighted-noise contribution `contrib(w_tile)` into the
    running (β, η, ΔŨ) state, rescaling by f = exp((β_new−β_old)/λ) ≤ 1
    when the tile lowers β (the flash-attention max-shift argument — every
    exponent stays ≤ 0)."""
    b_old = run_scr[0, 0]
    b_new = jnp.minimum(b_old, jnp.min(S))
    f = jnp.exp((b_new - b_old) / lam)    # ≤ 1; exactly 0 on the first tile
    w_tile = jnp.exp(-(S - b_new) / lam)  # pad lanes/ranks underflow to 0
    run_scr[0, 0] = b_new
    run_scr[0, 1] = f * run_scr[0, 1] + jnp.sum(w_tile)
    acc_scr[:, :] = f * acc_scr[:, :] + contrib(w_tile)


def _expand_group_weights(w_tile, plan: PallasPlan):
    """(G, KB) group weights → (SUB, KB): one row per (group, action-dim),
    rows g*A+i = w[g], zero on the G·A..SUB pad rows."""
    A, G, KB = plan.A, plan.G, plan.KB
    return jnp.concatenate(
        [w_tile[g:g + 1, :] for g in range(G) for _ in range(A)]
        + [jnp.zeros((SUB - G * A, KB), jnp.float32)] * (1 if SUB - G * A else 0),
        axis=0,
    )


def _chunked_slab_blocks(w_big, eps_scr, KB: int, T: int, Tc: int):
    """Shared core of the staged-ε weighted update (row-packed AND planar):
    for each static CH-step chunk, read the (CH·SUB, KB) slab, mask the
    stale tail rows OUT (steps ≥ T hold old buffer contents — can be
    anything incl. NaN, so select, don't zero-mul), lane-reduce once, and
    yield the (CH, SUB) block."""
    for c in range(0, Tc, CH):
        slab = eps_scr[c:c + CH].reshape(CH * SUB, KB)
        prod = w_big * slab
        if c + CH > T:
            row_t = jax.lax.broadcasted_iota(jnp.int32, (CH * SUB, KB), 0) // SUB
            prod = jnp.where(c + row_t < T, prod, 0.0)
        red = jnp.sum(prod, axis=1, keepdims=True)       # (CH·SUB, 1)
        yield red.reshape(CH, SUB)


def _update_phase_from_buf(w_tile, eps_scr, plan: PallasPlan):
    """One-pass weighted update: ΔU contribution of THIS tile read back from
    the ε stage buffer `eps_scr` (Tc, SUB, KB) that :func:`_rollout_phase_S`
    just filled — no PRNG regeneration and no per-step one-hot scatter.

    Timesteps are processed in static chunks of CH via
    :func:`_chunked_slab_blocks`; each block's packed (group, dim) rows are
    folded into (A, CH) and concatenated statically into lane position —
    roofline-measured at ~4× less VPU work than the per-step
    regenerate+scatter loop (see docs/kernels.md)."""
    A, G, T, Tc, Tpad = plan.A, plan.G, plan.T, plan.Tc, plan.Tpad
    KB = plan.stageKB
    w_exp = _expand_group_weights(w_tile, plan)
    if plan.anti:
        # mirrors are −ε⁺ exactly: Σ w⁺ε⁺ + w⁻ε⁻ = Σ (w⁺ − w⁻) ε⁺
        w_exp = w_exp[:, :KB] - w_exp[:, KB:]
    w_big = jnp.broadcast_to(w_exp[None], (CH, SUB, KB)).reshape(CH * SUB, KB)
    blocks = []
    for blk in _chunked_slab_blocks(w_big, eps_scr, KB, T, Tc):
        blk = blk.T                                       # (SUB, CH): rows = packed dims
        fold = blk[0:A]
        for g in range(1, G):
            fold = fold + blk[g * A:(g + 1) * A]          # (A, CH)
        blocks.append(fold)
    du = jnp.concatenate(blocks, axis=1)                  # (A, Tc)
    return jnp.pad(du, ((0, SUB - A), (0, Tpad - Tc)))    # (SUB, Tpad)


def _update_phase_acc(tile_i, w_tile, seeds, scal_ref, u_ref, p_ref, plan: PallasPlan):
    """Re-seed tile `tile_i`'s stream IDENTICALLY to :func:`_rollout_phase_S`,
    regenerate its noise, and return the (SUB, Tpad) ΔU contribution weighted
    by `w_tile` (G, KB). Shared by kernel B, the fused kernel and the fleet
    kernel."""
    A, G, KB, Tpad = plan.A, plan.G, plan.KB, plan.Tpad
    seed0, seed1, _ = seeds
    _seed(seed0, seed1, tile_i)
    u_all = u_ref[:, :]  # noqa: F841 — unused; kept so both phases read the same refs
    sigma = p_ref[:, _P_SIGMA:_P_SIGMA + 1]
    w_exp = _expand_group_weights(w_tile, plan)

    sid = _kernel_sid(seed0, plan)

    def body(t, carry):
        acc, e_prev = carry
        eps, e_prev = _next_eps(t, e_prev, sigma, scal_ref, KB, plan.anti, plan.ou, tile_i, plan.testmode, sid)
        col = jnp.sum(w_exp * eps, axis=1, keepdims=True)  # (SUB, 1)
        # fold groups: dU_t[i] = Σ_g col[g*A + i]
        fold = col[0:A]
        for g in range(1, G):
            fold = fold + col[g * A:(g + 1) * A]
        fold = jnp.concatenate([fold, jnp.zeros((SUB - A, 1), jnp.float32)], axis=0)
        return acc + fold * _onehot_lanes(t, Tpad), e_prev  # scatter into column t

    acc, _ = jax.lax.fori_loop(
        0, plan.T, body,
        (jnp.zeros((SUB, Tpad), jnp.float32), jnp.zeros((SUB, KB), jnp.float32)),
    )
    return acc



def _rollout_cost_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)]
    u_ref,      # VMEM (SUB, Tpad): nominal U — group-tiled rows, transposed
    p_ref,      # VMEM (SUB, NP): family parameter pack (see FAMILIES)
    s_ref,      # out VMEM (G, KB): per-rollout total cost, rows = groups
    *, plan: PallasPlan,
):
    s_ref[:, :] = _rollout_phase_S(
        pl.program_id(0), (ints_ref[0, 0], ints_ref[0, 1], ints_ref[0, 2]),
        scal_ref, u_ref, p_ref, plan,
    )


def _weighted_update_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)]
    u_ref,      # VMEM (SUB, Tpad)
    p_ref,      # VMEM (SUB, NP)
    w_ref,      # VMEM (G, KB): softmin weights for this tile, rows = groups
    du_ref,     # out VMEM (SUB, Tpad): ΔU accumulated over all tiles
    *, plan: PallasPlan,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        du_ref[:, :] = jnp.zeros_like(du_ref)

    du_ref[:, :] += _update_phase_acc(
        i, w_ref[:, :], (ints_ref[0, 0], ints_ref[0, 1], ints_ref[0, 2]),
        scal_ref, u_ref, p_ref, plan,
    )


def pack_inputs(
    dyn,          # dynamics of a registered fused family (see FAMILIES)
    cost,         # matching cost of that family,
    x0: jax.Array,
    U: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    plan: PallasPlan,
    softmin_lambda: jax.Array | None = None,
    ou_beta: float = 0.0,
):
    """Host-side (traced) packing of the tiny per-solve inputs, shared by both
    kernels — call once per solve. All per-dim
    vectors are group-tiled: row g*A+i = value for dim i, any group g.
    The P matrix layout is family-specific (see FAMILIES)."""
    A, G, T, Tpad = plan.A, plan.G, plan.T, plan.Tpad
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seeds = jax.lax.bitcast_convert_type(kd[:2], jnp.int32)
    ints = jnp.concatenate([seeds, jnp.array([plan.K, T], jnp.int32)]).reshape(1, 4)
    lam_sm = cost.lambda_ if softmin_lambda is None else softmin_lambda
    ou_c = (1.0 - float(ou_beta) ** 2) ** 0.5
    scal = jnp.stack(
        [
            dyn.dt.astype(jnp.float32),
            cost.lambda_.astype(jnp.float32),   # control-cost λ
            jnp.asarray(lam_sm, jnp.float32),   # softmin temperature (fused kernel)
            jnp.float32(ou_beta),               # OU noise correlation β
            jnp.float32(ou_c),                  # √(1−β²)
        ]
    ).reshape(1, 5)

    u_rows = jnp.tile(U.T.astype(jnp.float32), (G, 1))  # (G*A, T)
    u_tile = jnp.zeros((SUB, Tpad), jnp.float32).at[: G * A, :T].set(u_rows)

    def tileA(v):  # (A,) -> (SUB,): group-tiled then zero-padded
        v = jnp.broadcast_to(v, (A,)).astype(jnp.float32)
        return jnp.zeros((SUB,), jnp.float32).at[: G * A].set(jnp.tile(v, G))

    p = FAMILIES[plan.family].pack(dyn, cost, x0, sigma, plan, tileA)
    return ints, scal, u_tile, p


def pallas_rollout_costs(
    dyn,          # dynamics of a registered fused family (see FAMILIES)
    cost,         # matching cost of that family,
    x0: jax.Array,
    U: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    *,
    K: int,
    antithetic: bool = False,
    ou_beta: float = 0.0,
    interpret: bool = False,
    packed=None,
    testmode: bool = False,
) -> jax.Array:
    """Kernel A: per-rollout total costs, shape (Kpad,) with BIG in the pad.
    The (T, K, a) noise is generated on-chip and discarded — regenerate it
    deterministically with :func:`pallas_weighted_update` (same key).
    Pass `packed` (from :func:`pack_inputs`) to share packing across both
    kernels of one solve."""
    fam_name = family_for(dyn, cost)
    plan = make_plan(
        K, U.shape[0], U.shape[1], antithetic, ou_beta, testmode,
        family=fam_name, extra=_plan_extra(FAMILIES[fam_name], cost),
    )
    ints, scal, u_tile, p = (
        packed if packed is not None
        else pack_inputs(dyn, cost, x0, U, key, sigma, plan, ou_beta=ou_beta)
    )
    NP = _np_cols(FAMILIES[plan.family], plan)
    S = pl.pallas_call(
        functools.partial(_rollout_cost_kernel, plan=plan),
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, NP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((plan.G, plan.KB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((plan.G, plan.Kpg), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET if interpret else False,
    )(ints, scal, u_tile, p)
    S = S.reshape(plan.Kpad)
    if plan.anti:
        S = S[anti_rank_perm(plan)]  # rank order: real rollouts occupy [:K]
    return S


def pallas_weighted_update(
    dyn,          # dynamics of a registered fused family (see FAMILIES)
    cost,         # matching cost of that family,
    x0: jax.Array,
    U: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    weights: jax.Array,  # (Kpad,) softmin weights (0 in the pad)
    *,
    K: int,
    antithetic: bool = False,
    ou_beta: float = 0.0,
    interpret: bool = False,
    packed=None,
    testmode: bool = False,
) -> jax.Array:
    """Kernel B: ΔU[t] = Σ_k w_k ε_k[t] (T, a), regenerating ε from `key`.
    This is the reference's `update_act` T-loop of reduction ladders
    (src/point_mass.cu:384-480) as one single-launch kernel with zero HBM
    traffic for ε."""
    fam_name = family_for(dyn, cost)
    plan = make_plan(
        K, U.shape[0], U.shape[1], antithetic, ou_beta, testmode,
        family=fam_name, extra=_plan_extra(FAMILIES[fam_name], cost),
    )
    ints, scal, u_tile, p = (
        packed if packed is not None
        else pack_inputs(dyn, cost, x0, U, key, sigma, plan, ou_beta=ou_beta)
    )
    NP = _np_cols(FAMILIES[plan.family], plan)
    dU_call = pl.pallas_call(
        functools.partial(_weighted_update_kernel, plan=plan),
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, NP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.G, plan.KB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, plan.Tpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: accumulates du_ref
        ),
        interpret=_INTERPRET if interpret else False,
    )
    if plan.anti:
        # weights arrive rank-ordered (matching pallas_rollout_costs' S);
        # kernels address lanes, so scatter back to lane order
        perm = anti_rank_perm(plan)
        weights = jnp.zeros_like(weights).at[perm].set(weights)
    dU = dU_call(ints, scal, u_tile, p, weights.reshape(plan.G, plan.Kpg))
    return dU[: plan.A, : plan.T].T  # (T, a)


def check_supported(dyn, cost) -> None:
    """Raise TypeError unless some fused family covers (dyn, cost)."""
    family_for(dyn, cost)


def _noise_dump_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)]
    u_ref,      # VMEM (SUB, Tpad) — unused; kept so all kernels share packing
    p_ref,      # VMEM (SUB, NP)
    e_ref,      # out VMEM (1, SUB, KB): this (tile, t)'s noise block
    ep_scr,     # VMEM scratch (SUB, KB): OU e_{t−1} carried across t-steps
    *, plan: PallasPlan,
):
    """Kernel D (debug dump): write the EXECUTED noise stream to HBM.

    Grid is (tiles, T) with t iterating fastest; the PRNG is seeded only at
    t == 0 exactly as kernels A/B seed once per tile, so the hardware PRNG
    state carries across the T grid steps and replays the identical ε
    sequence the solve consumed — this is the TPU analog of the reference's
    `save_e` ε round-trip (reference src/point_mass_gpu.cu:123-129), made
    opt-in so the hot path never pays the (T, K, a) HBM traffic."""
    del u_ref
    i, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed(ints_ref[0, 0], ints_ref[0, 1], i)
        ep_scr[:, :] = jnp.zeros_like(ep_scr)

    sigma = p_ref[:, _P_SIGMA:_P_SIGMA + 1]
    sid = _kernel_sid(ints_ref[0, 0], plan)
    eps, e_prev = _next_eps(
        t, ep_scr[:, :], sigma, scal_ref, plan.KB, plan.anti, plan.ou, i,
        plan.testmode, sid,
    )
    if plan.ou:
        ep_scr[:, :] = e_prev
    e_ref[0, :, :] = eps


def pallas_noise_dump(
    dyn,
    cost,
    x0: jax.Array,
    U: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    *,
    K: int,
    antithetic: bool = False,
    ou_beta: float = 0.0,
    interpret: bool = False,
    testmode: bool = False,
    # None → replay the stream *pallas_solve* consumes for these arguments:
    # the planar one-pass core on the compiled path (plan.planar), the
    # row-packed kernels A/B under the interpreter. Callers pairing the dump
    # with a DIFFERENT entry point (e.g. pallas_fused_solve_core with
    # interpret=True, which still runs the planar core when plan.planar)
    # must pass planar explicitly — see the docstring.
    planar: bool | None = None,
) -> jax.Array:
    """The (T, K, a) noise tensor the fused kernels generated for `key`, in
    ROLLOUT-RANK order — bit-identical to the stream the solve consumed.
    Debug/dump path only (the reference always materializes ε,
    src/point_mass.cu:63; here it is opt-in).

    `planar` selects which stream to replay; the default (None) matches what
    `controller.pallas_solve` executes: the planar one-pass core on the
    compiled path (`plan.planar`), the row-packed kernels A/B under the
    interpreter (pallas_solve keeps the two-kernel path there — the Mosaic
    interpreter deadlocks on the one-pass kernel under many shard_map device
    threads). The default is pallas_solve-SPECIFIC: when pairing the dump
    with `pallas_fused_solve_core(interpret=True)` (which runs the planar
    core whenever `plan.planar`, interpreter or not), pass `planar=True`
    explicitly, or the dump replays the wrong stream."""
    fam_name = family_for(dyn, cost)
    plan = make_plan(
        K, U.shape[0], U.shape[1], antithetic, ou_beta, testmode,
        family=fam_name, extra=_plan_extra(FAMILIES[fam_name], cost),
    )
    if planar is None:
        planar = plan.planar and not interpret
    if planar:
        assert plan.planar, "planar dump requested but the plan is row-packed"
        return _planar_noise_dump(
            dyn, cost, x0, U, key, sigma, plan, ou_beta, interpret
        )
    ints, scal, u_tile, p = pack_inputs(dyn, cost, x0, U, key, sigma, plan, ou_beta=ou_beta)
    NP = _np_cols(FAMILIES[plan.family], plan)
    e = pl.pallas_call(
        functools.partial(_noise_dump_kernel, plan=plan),
        grid=(plan.grid, plan.T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, plan.Tpad), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, NP), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, plan.KB), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((plan.T, SUB, plan.Kpg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SUB, plan.KB), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),  # sequential: PRNG state
        ),
        interpret=_INTERPRET if interpret else False,
    )(ints, scal, u_tile, p)
    # (T, SUB, Kpg) -> (T, Kpad, A): rollout k = g*Kpg + tile*KB + lane lives
    # at rows g*A..g*A+A-1, flat lane tile*KB+lane (the kernels' indexing
    # convention — see module docstring)
    A, G = plan.A, plan.G
    parts = [
        jnp.swapaxes(e[:, g * A:(g + 1) * A, :], 1, 2) for g in range(G)
    ]  # each (T, Kpg, A)
    eps = jnp.concatenate(parts, axis=1)  # (T, G*Kpg, A) in flat-lane order
    if plan.anti:
        eps = eps[:, anti_rank_perm(plan), :]  # rank order, pairs adjacent
    return eps[:, :K, :]


def _softmin_phase(sw_scr, lam, plan: PallasPlan):
    """In-place softmin over the cost scratch: S → w = exp(−(S−β)/λ)/η,
    with β and η reduced chunk-wise over the nk lane chunks. Shared by the
    fused kernel and the fleet kernel — like the A/B phase bodies, the
    execution modes must not be able to drift."""
    KB, nk = plan.KB, plan.grid

    def min_chunk(j, m):
        c = sw_scr[:, pl.ds(pl.multiple_of(j * KB, LANE), KB)]
        return jnp.minimum(m, jnp.min(c))

    beta = jax.lax.fori_loop(0, nk, min_chunk, jnp.float32(BIG))

    def exp_chunk(j, eta):
        idx = pl.ds(pl.multiple_of(j * KB, LANE), KB)
        e = jnp.exp(-(sw_scr[:, idx] - beta) / lam)
        sw_scr[:, idx] = e
        return eta + jnp.sum(e)

    eta = jax.lax.fori_loop(0, nk, exp_chunk, jnp.float32(0.0))
    inv_eta = 1.0 / eta

    def scale_chunk(j, _):
        idx = pl.ds(pl.multiple_of(j * KB, LANE), KB)
        sw_scr[:, idx] = sw_scr[:, idx] * inv_eta
        return 0

    jax.lax.fori_loop(0, nk, scale_chunk, 0)


def _fused_solve_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)]
    u_ref,      # VMEM (SUB, Tpad)
    p_ref,      # VMEM (SUB, NP)
    s_ref,      # out VMEM (G, KB) blocks: per-rollout costs
    du_ref,     # out VMEM (SUB, Tpad): ΔU
    sw_scr,     # VMEM scratch (G, Kpg): S during phase A, softmin w after
    acc_scr,    # VMEM scratch (SUB, Tpad): ΔU accumulator for phase B
    *, plan: PallasPlan,
):
    """The ENTIRE MPPI solve as one kernel: grid = [A-tiles | softmin | B-tiles].

    Phases communicate through `sw_scr`, which persists across grid steps
    (Pallas TPU scratch semantics): phase A deposits each tile's costs at its
    lane offset, the middle step turns S into softmin weights **in place**
    (β, η reduced chunk-wise), and phase B tiles read their weight slice
    while regenerating the identical noise stream. The phase bodies are the
    SAME functions kernels A/B use (_rollout_phase_S / _update_phase_acc),
    so the fused and two-kernel modes cannot drift. Single-chip only — the
    sharded path keeps the two-kernel form so β/η can cross the mesh as
    pmin/psum between the kernels."""
    i = pl.program_id(0)
    KB, nk = plan.KB, plan.grid
    lam = scal_ref[0, 2]  # softmin temperature
    seeds = (ints_ref[0, 0], ints_ref[0, 1], ints_ref[0, 2])

    @pl.when(i == 0)
    def _():
        du_ref[:, :] = jnp.zeros_like(du_ref)
        acc_scr[:, :] = jnp.zeros_like(acc_scr)

    @pl.when(i < nk)
    def _():  # ---- phase A: rollout costs for tile i
        S = _rollout_phase_S(i, seeds, scal_ref, u_ref, p_ref, plan)
        s_ref[:, :] = S
        sw_scr[:, pl.ds(pl.multiple_of(i * KB, LANE), KB)] = S

    @pl.when(i == nk)
    def _():  # ---- softmin in place: S → w = exp(−(S−β)/λ)/η
        _softmin_phase(sw_scr, lam, plan)

    @pl.when(i > nk)
    def _():  # ---- phase B: ΔU accumulation for tile j = i − nk − 1
        j = i - nk - 1
        w = sw_scr[:, pl.ds(pl.multiple_of(j * KB, LANE), KB)]  # (G, KB)
        acc_scr[:, :] += _update_phase_acc(
            j, w, seeds, scal_ref, u_ref, p_ref, plan
        )

        @pl.when(i == 2 * nk)
        def _():
            du_ref[:, :] = acc_scr[:, :]


def _onepass_solve_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)]
    u_ref,      # VMEM (SUB, Tpad)
    p_ref,      # VMEM (SUB, NP)
    *rest,      # [u3_ref (T, SUB, LANE) lane-replicated U table — plan.u3 only]
                # + s_ref (out, (G, KB) blocks: per-rollout costs)
                # + du_ref (out, (SUB, Tpad): ΔU)
                # + [bn_ref (SMEM out (1,2): local β, η — normalize=False only)]
                # + scratches: eps stage (Tc, SUB, KB), run (1,2) SMEM, acc
    plan: PallasPlan,
    normalize: bool = True,
):
    """The ENTIRE MPPI solve in ONE pass over the rollout tiles.

    Each grid step handles one K-tile end to end: rollout (staging the
    consumed ε in VMEM), then ONLINE softmin — the flash-attention trick
    applied to MPPI: maintain running β and η, rescale the running
    accumulators by f = exp((β_new−β_old)/λ) ≤ 1 whenever a later tile
    lowers β, and accumulate this tile's UNNORMALIZED weighted noise from
    the stage buffer. The final tile divides by η. Mathematically identical
    to the two-pass softmin (every exponent is ≤ 0 throughout — the same
    max-shift stability argument as online softmax); ε is generated ONCE
    instead of twice and the per-step one-hot ΔU scatter disappears —
    together ~45 % of the two-pass solve at K=10⁵, T=200 (docs/kernels.md).

    β_run initializes to BIG, so the first tile's rescale factor underflows
    to exactly 0 and no first-tile special-casing is needed. η ≥ 1 at the
    end (the global-min rollout contributes exp(0) = 1 and is never
    rescaled), so the division is always safe. The rollout body is the SAME
    `_rollout_phase_S` the other modes use.

    `normalize=False` (the SHARDED per-device form) skips the final
    division and additionally emits the local (β, η) through `bn_ref`: the
    online softmin is associative, so devices combine exactly like tiles —
    β = pmin(β_d), η = psum(f_d·η_d), ΔU = psum(f_d·ΔŨ_d)/η with
    f_d = exp((β−β_d)/λ) — three small all-reduces in XLA
    (see controller.pallas_solve)."""
    rest = list(rest)
    u3_ref = rest.pop(0) if plan.u3 else None
    s_ref, du_ref = rest.pop(0), rest.pop(0)
    if normalize:
        eps_scr, run_scr, acc_scr = rest
    else:
        bn_ref, eps_scr, run_scr, acc_scr = rest
    i = pl.program_id(0)
    lam = scal_ref[0, 2]  # softmin temperature
    seeds = (ints_ref[0, 0], ints_ref[0, 1], ints_ref[0, 2])

    @pl.when(i == 0)
    def _():
        acc_scr[:, :] = jnp.zeros_like(acc_scr)
        run_scr[0, 0] = jnp.float32(BIG)   # β_run
        run_scr[0, 1] = jnp.float32(0.0)   # η_run

    S = _rollout_phase_S(i, seeds, scal_ref, u_ref, p_ref, plan,
                         eps_out=eps_scr,
                         u3_at=(lambda t: u3_ref[t]) if plan.u3 else None)
    s_ref[:, :] = S
    _online_softmin_step(
        S, lam, run_scr, acc_scr,
        lambda w: _update_phase_from_buf(w, eps_scr, plan),
    )

    @pl.when(i == plan.grid - 1)
    def _():
        if normalize:
            du_ref[:, :] = acc_scr[:, :] * (1.0 / run_scr[0, 1])
        else:
            du_ref[:, :] = acc_scr[:, :]
            bn_ref[0, 0] = run_scr[0, 0]
            bn_ref[0, 1] = run_scr[0, 1]


def pallas_fused_solve_core(
    dyn,          # dynamics of a registered fused family (see FAMILIES)
    cost,         # matching cost of that family,
    x0: jax.Array,
    U: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    lambda_: jax.Array,
    *,
    K: int,
    antithetic: bool = False,
    ou_beta: float = 0.0,
    testmode: bool = False,
    interpret: bool = False,
    normalize: bool = True,
):
    """Single-launch MPPI solve core: (S (Kpad,), ΔU (T, a)) in ONE kernel —
    no XLA ops or dispatch between the rollout, softmin, and update phases.
    λ is read from the packed scalars (cost.lambda_).

    Two kernel forms, chosen by the plan: the ONE-PASS form (default when
    the ε stage buffer fits VMEM — `plan.onepass`) rolls out, online-softmins
    and updates per tile in a single sweep; the two-pass form (grid
    [A-tiles | softmin | B-tiles], ε regenerated) remains for long horizons.

    `normalize=False` (requires a one-pass-capable plan) returns the
    SHARDED per-device form (S, ΔŨ unnormalized, β_local, η_local): the
    online softmin is associative, so devices combine exactly like tiles
    with three all-reduces — see controller.pallas_solve."""
    fam_name = family_for(dyn, cost)
    plan = make_plan(
        K, U.shape[0], U.shape[1], antithetic, ou_beta, testmode,
        family=fam_name, extra=_plan_extra(FAMILIES[fam_name], cost),
    )
    if not normalize and not (plan.onepass or plan.planar):
        raise ValueError("normalize=False needs a one-pass-capable plan")
    if plan.planar:
        return _planar_fused_solve(
            dyn, cost, x0, U, key, sigma, lambda_, plan, ou_beta, interpret,
            normalize=normalize,
        )
    ints, scal, u_tile, p = pack_inputs(
        dyn, cost, x0, U, key, sigma, plan, softmin_lambda=lambda_, ou_beta=ou_beta
    )
    nk = plan.grid
    common = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, _np_cols(FAMILIES[plan.family], plan)), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((plan.G, plan.Kpg), jnp.float32),
            jax.ShapeDtypeStruct((SUB, plan.Tpad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET if interpret else False,
    )
    bn = None
    if plan.onepass:
        inputs = (ints, scal, u_tile, p)
        if plan.u3:
            # lane-replicated U table for the kernel's leading-dim step read
            # (XLA-side broadcast; 4·T·SUB·LANE bytes = 4 KB per step of VMEM;
            # plan.u3 is False at long T where the table would blow VMEM —
            # the kernel then one-hot-extracts U[t] from u_tile instead)
            u3 = jnp.broadcast_to(
                u_tile[:, : plan.T].T[:, :, None], (plan.T, SUB, LANE)
            )
            inputs = inputs + (u3,)
            common["in_specs"] = common["in_specs"] + [
                pl.BlockSpec((plan.T, SUB, LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ]
        out_specs = [
            pl.BlockSpec((plan.G, plan.KB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if not normalize:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            common["out_shape"] = common["out_shape"] + (
                jax.ShapeDtypeStruct((1, 2), jnp.float32),
            )
        out = pl.pallas_call(
            functools.partial(_onepass_solve_kernel, plan=plan, normalize=normalize),
            grid=(nk,),
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((plan.Tc, SUB, plan.stageKB), jnp.float32),
                pltpu.SMEM((1, 2), jnp.float32),
                pltpu.VMEM((SUB, plan.Tpad), jnp.float32),
            ],
            **common,
        )(*inputs)
        S, dU = out[0], out[1]
        if not normalize:
            bn = out[2]
    else:
        S, dU = pl.pallas_call(
            functools.partial(_fused_solve_kernel, plan=plan),
            grid=(2 * nk + 1,),
            out_specs=(
                # phase-A tiles write their block; later phases keep re-flushing
                # the last block with identical content (harmless)
                pl.BlockSpec(
                    (plan.G, plan.KB),
                    lambda i: (0, jnp.minimum(i, plan.grid - 1)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((plan.G, plan.Kpg), jnp.float32),
                pltpu.VMEM((SUB, plan.Tpad), jnp.float32),
            ],
            **common,
        )(ints, scal, u_tile, p)
    S = S.reshape(plan.Kpad)
    if plan.anti:
        S = S[anti_rank_perm(plan)]  # rank order: real rollouts occupy [:K]
    dU = dU[: plan.A, : plan.T].T
    if bn is not None:
        return S, dU, bn[0, 0], bn[0, 1]
    return S, dU


# --------------------------------------------------------------------------
# Planar layout: dims on tiles, whole rollout groups on sublanes.
#
# The row-packed layout puts (group, dim) pairs on the 8 sublanes, wasting
# SUB − G·A rows whenever SUB % A != 0 — at A=3 that is 25 % of all noise
# generation and dynamics arithmetic (docs/kernels.md roofline). The planar
# layout instead gives each ACTION DIM its own (SUB, KB) tile whose rows are
# 8 whole rollouts: per grid step, A ε-tiles drive 8·KB rollouts with zero
# pad rows, the per-dim action is a single SMEM scalar read (no U table, no
# one-hot), and the per-group sublane cost reduction disappears entirely
# (the cost accumulator's rows ARE rollouts). Implemented for the families
# whose dynamics are elementwise per dim (PLANAR_FAMILIES); used by the
# one-pass fused core (single-chip AND per-device under a mesh, via
# normalize=False) and the noise dump — kernels A/B (the interpreter-tested
# fallback) keep the row-packed layout, each self-consistent with its own
# stream.
# --------------------------------------------------------------------------

_PLANAR_DIM_SALT = 0.733  # testmode noise: decorrelates the A per-step draws


def _anti_perm(Kpad: int, KB: int) -> jax.Array:
    """(Kpad,) gather indices: rank-ordered vector = lane_flat[perm], for
    any layout whose flat index is (..., KB-lane-blocks) with antithetic
    mirror pairs (m, m+KB/2) inside each block."""
    half = KB // 2
    r = jnp.arange(Kpad)
    block, within = (r // KB) * KB, r % KB
    m = within // 2
    lane = jnp.where(within % 2 == 0, m, m + half)
    return block + lane


def _planar_lane_rank(plan: PallasPlan, i):
    """(SUB, KB) global rollout RANK of each element in planar grid step i:
    rank = row·Kpg_p + i·KBp + lane (antithetic pairs get adjacent ranks,
    same scheme as :func:`_lane_rank`)."""
    KB = plan.KBp
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 1)
    if plan.anti:
        half = KB // 2
        m = jnp.where(lane < half, lane, lane - half)
        lane = 2 * m + (lane >= half).astype(jnp.int32)
    return (
        jax.lax.broadcasted_iota(jnp.int32, (SUB, KB), 0) * plan.Kpg_p
        + i * KB
        + lane
    )


def _planar_draw(t, tile, dim: int, KB: int, anti: bool, testmode: bool, sid):
    """One (SUB, KB) standard-normal tile for action dim `dim` at step t.
    Dims draw IN ORDER 0..A−1 each step, so the PRNG stream is a pure
    function of the seed — the planar dump kernel replays it exactly."""
    if testmode:
        kb = KB // 2 if anti else KB
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, kb), 0).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, kb), 1).astype(jnp.float32)
        n = jnp.sin(
            0.917 * jnp.float32(t) + 0.379 * lane + 1.37 * row
            + 2.11 * jnp.float32(tile) + 0.547 * sid
            + _PLANAR_DIM_SALT * jnp.float32(dim)
        )
    else:
        n = _standard_normal((SUB, KB // 2 if anti else KB))
    if anti:
        n = jnp.concatenate([n, -n], axis=1)
    return n


def _planar_rollout_S(tile_i, seeds, scal_ref, u_at, p_at, plan: PallasPlan,
                      eps_scrs):
    """Planar rollout-cost phase: integrate 8·KB rollouts over T with rows =
    WHOLE rollouts, staging each dim's consumed ε in its VMEM buffer
    `eps_scrs[dim]` (Tc, SUB, KB). Returns the K-masked (SUB, KB) cost tile
    — no group reduction (and for coupled families no group DUPLICATION:
    the dynamics run once per rollout instead of the row-packed form's A×,
    round 5). Generic over the family: per step the A noise tiles are drawn
    in dim order 0..A−1 (the PRNG stream is layout-defined, not
    family-defined), the generic λ·uᵀΣ⁻¹ε control term accumulates here,
    and the family's `build_planar` closures supply the state integration +
    state cost on per-component (SUB, KB) tiles. `u_at(t, i)` yields the
    step-t dim-i nominal action (scalar or (1, 1) array — the single-robot
    kernel reads SMEM scalars, the fleet kernel slices a windowed SMEM
    view); `p_at(row, col)` reads the (A, NP) parameter table."""
    A, KB = plan.A, plan.KBp
    fam = FAMILIES[plan.family]
    seed0, seed1, k_true = seeds
    _seed(seed0, seed1, tile_i)
    lam = scal_ref[0, 1]
    sid = _kernel_sid(seed0, plan)

    sig = [p_at(i, _P_SIGMA) for i in range(A)]
    lam_invs = [lam * p_at(i, _P_INVS) for i in range(A)]
    carry0, fam_step, fam_final = fam.build_planar(p_at, scal_ref, plan)

    def body(t, carry):
        state, acc, e_prev = carry
        acts, e2 = [], []
        for i in range(A):
            n = _planar_draw(t, tile_i, i, KB, plan.anti, plan.testmode, sid)
            if plan.ou:
                beta, c = scal_ref[0, 3], scal_ref[0, 4]
                e = jnp.where(t == 0, n, beta * e_prev[i] + c * n)
            else:
                e = n
            eps = sig[i] * e
            eps_scrs[i][t] = eps[:, : KB // 2] if plan.anti else eps
            u_i = u_at(t, i)
            acc = acc + (lam_invs[i] * u_i) * eps
            acts.append(u_i + eps)
            e2.append(e)
        state, c_state = fam_step(state, acts)
        acc = acc + c_state
        return state, acc, tuple(e2)

    zero = jnp.zeros((SUB, KB), jnp.float32)
    state, acc, _ = jax.lax.fori_loop(
        0, plan.T, body, (carry0(), zero, tuple(zero for _ in range(A)))
    )
    acc = acc + fam_final(state)  # terminal double-count (reference parity)
    return jnp.where(_planar_lane_rank(plan, tile_i) < k_true, acc, jnp.float32(BIG))


def _planar_update_from_buf(w_tile, eps_scrs, plan: PallasPlan):
    """Planar one-pass weighted update: ΔU contribution of THIS tile read
    back from the per-dim ε stage buffers — ΔU[t, i] = Σ over the full
    (SUB, KBp) tile of w ⊙ ε_i[t], chunked CH steps at a time."""
    T, Tc, Tpad = plan.T, plan.Tc, plan.Tpad
    KB = plan.stageKB_p
    if plan.anti:
        w_tile = w_tile[:, :KB] - w_tile[:, KB:]  # fold mirror weights
    w_big = jnp.broadcast_to(w_tile[None], (CH, SUB, KB)).reshape(CH * SUB, KB)
    rows = []
    for scr in eps_scrs:
        blocks = [
            jnp.sum(blk, axis=1, keepdims=True).T             # (1, CH)
            for blk in _chunked_slab_blocks(w_big, scr, KB, T, Tc)
        ]
        rows.append(jnp.concatenate(blocks, axis=1))          # (1, Tc)
    du = jnp.concatenate(rows, axis=0)                        # (A, Tc)
    return jnp.pad(du, ((0, SUB - plan.A), (0, Tpad - Tc)))   # (SUB, Tpad)


def _planar_onepass_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)]
    u_sm,       # SMEM (T, A) f32:  nominal U (per-step scalar reads)
    p_sm,       # SMEM (A, NP) f32: per-dim parameter pack
    s_ref,      # out VMEM (SUB, KB) blocks: per-rollout costs
    du_ref,     # out VMEM (SUB, Tpad): ΔU
    *rest,      # [bn_ref (SMEM out (1,2) — normalize=False)] + scratches:
                # A × VMEM (Tc, SUB, KBp) ε stages, SMEM (1,2) run, VMEM acc
    plan: PallasPlan,
    normalize: bool = True,
):
    """Planar one-pass MPPI solve — the same online-softmin sweep as
    :func:`_onepass_solve_kernel` on the planar layout (see there for the
    `normalize=False` sharded per-device form)."""
    if not normalize:
        bn_ref, rest = rest[0], rest[1:]
    eps_scrs = rest[: plan.A]
    run_scr, acc_scr = rest[plan.A], rest[plan.A + 1]
    i = pl.program_id(0)
    lam = scal_ref[0, 2]
    seeds = (ints_ref[0, 0], ints_ref[0, 1], ints_ref[0, 2])

    @pl.when(i == 0)
    def _():
        acc_scr[:, :] = jnp.zeros_like(acc_scr)
        run_scr[0, 0] = jnp.float32(BIG)   # β_run
        run_scr[0, 1] = jnp.float32(0.0)   # η_run

    S = _planar_rollout_S(
        i, seeds, scal_ref,
        lambda t, d: u_sm[t, d], lambda d, c: p_sm[d, c], plan, eps_scrs,
    )
    s_ref[:, :] = S
    _online_softmin_step(
        S, lam, run_scr, acc_scr,
        lambda w: _planar_update_from_buf(w, eps_scrs, plan),
    )

    @pl.when(i == plan.grid_p - 1)
    def _():
        if normalize:
            du_ref[:, :] = acc_scr[:, :] * (1.0 / run_scr[0, 1])
        else:
            du_ref[:, :] = acc_scr[:, :]
            bn_ref[0, 0] = run_scr[0, 0]
            bn_ref[0, 1] = run_scr[0, 1]


def _planar_pack(dyn, cost, x0, U, key, sigma, plan: PallasPlan,
                 softmin_lambda=None, ou_beta: float = 0.0):
    """SMEM-side packing for the planar kernels: same ints/scal words as
    :func:`pack_inputs`, U as a (T, A) scalar table, params as the family's
    (A, NP) per-dim rows (`pack_planar` — cols 0/1 MUST be per-dim σ/Σ⁻¹,
    family scalars replicated across rows at the same column indices the
    row-packed pack uses)."""
    T = plan.T
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seeds = jax.lax.bitcast_convert_type(kd[:2], jnp.int32)
    ints = jnp.concatenate([seeds, jnp.array([plan.K, T], jnp.int32)]).reshape(1, 4)
    lam_sm = cost.lambda_ if softmin_lambda is None else softmin_lambda
    ou_c = (1.0 - float(ou_beta) ** 2) ** 0.5
    scal = jnp.stack(
        [
            dyn.dt.astype(jnp.float32),
            cost.lambda_.astype(jnp.float32),
            jnp.asarray(lam_sm, jnp.float32),
            jnp.float32(ou_beta),
            jnp.float32(ou_c),
        ]
    ).reshape(1, 5)
    u_sm = U.astype(jnp.float32)  # (T, A)
    p_sm = FAMILIES[plan.family].pack_planar(dyn, cost, x0, sigma, plan)
    return ints, scal, u_sm, p_sm


def _planar_fused_solve(
    dyn, cost, x0, U, key, sigma, lambda_, plan: PallasPlan, ou_beta: float,
    interpret: bool, normalize: bool = True,
):
    """Planar one-pass solve core: (S (Kpad_p,) rank-ordered, ΔU (T, a));
    with `normalize=False` additionally returns the local (β, η) and leaves
    ΔU unnormalized (the sharded per-device form)."""
    ints, scal, u_sm, p_sm = _planar_pack(
        dyn, cost, x0, U, key, sigma, plan, softmin_lambda=lambda_,
        ou_beta=ou_beta,
    )
    out_specs = [
        pl.BlockSpec((SUB, plan.KBp), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((SUB, plan.Tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((SUB, plan.Kpg_p), jnp.float32),
        jax.ShapeDtypeStruct((SUB, plan.Tpad), jnp.float32),
    ]
    if not normalize:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 2), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_planar_onepass_kernel, plan=plan, normalize=normalize),
        grid=(plan.grid_p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=(
            [pltpu.VMEM((plan.Tc, SUB, plan.stageKB_p), jnp.float32) for _ in range(plan.A)]
            + [pltpu.SMEM((1, 2), jnp.float32), pltpu.VMEM((SUB, plan.Tpad), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET if interpret else False,
    )(ints, scal, u_sm, p_sm)
    S, dU = out[0], out[1]
    S = S.reshape(plan.Kpad_p)
    if plan.anti:
        S = S[_anti_perm(plan.Kpad_p, plan.KBp)]
    dU = dU[: plan.A, : plan.T].T
    if normalize:
        return S, dU
    bn = out[2]
    return S, dU, bn[0, 0], bn[0, 1]


def _planar_costs_kernel(
    ints_ref,   # SMEM (1, 4) int32: [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32
    u_sm,       # SMEM (T, A) f32
    p_sm,       # SMEM (A, NP) f32
    s_ref,      # out VMEM (SUB, KB) blocks: per-rollout costs
    *eps_scrs,  # A × VMEM (Tc, SUB, KBp) ε stages (written like the solve's)
    plan: PallasPlan,
):
    """Costs-only planar sweep — the one-pass solve MINUS the online
    softmin/update: rollout + ε staging only. Exists as the planar rows'
    MEASURED FLOOR program (bench.bench_floor): the solve contains strictly
    more work than this, so p50(floor)/p50(solve) is a true utilization for
    planar plans (kernel A is the wrong geometry — row-packed, different
    stream — and reads as 'beats two-kernel A')."""
    i = pl.program_id(0)
    s_ref[:, :] = _planar_rollout_S(
        i, (ints_ref[0, 0], ints_ref[0, 1], ints_ref[0, 2]), scal_ref,
        lambda t, d: u_sm[t, d], lambda d, c: p_sm[d, c], plan, eps_scrs,
    )


def pallas_planar_rollout_costs(
    dyn, cost, x0, U, key, sigma, *, K: int, antithetic: bool = False,
    ou_beta: float = 0.0, testmode: bool = False, interpret: bool = False,
):
    """Rank-ordered (Kpad_p,) planar rollout costs (floor program — see
    :func:`_planar_costs_kernel`). Requires a planar-capable plan."""
    fam_name = family_for(dyn, cost)
    plan = make_plan(
        K, U.shape[0], U.shape[1], antithetic, ou_beta, testmode,
        family=fam_name, extra=_plan_extra(FAMILIES[fam_name], cost),
    )
    if not plan.planar:
        raise ValueError(f"family '{fam_name}' has no planar plan here")
    ints, scal, u_sm, p_sm = _planar_pack(
        dyn, cost, x0, U, key, sigma, plan, ou_beta=ou_beta
    )
    S = pl.pallas_call(
        functools.partial(_planar_costs_kernel, plan=plan),
        grid=(plan.grid_p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4,
        out_specs=pl.BlockSpec(
            (SUB, plan.KBp), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((SUB, plan.Kpg_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((plan.Tc, SUB, plan.stageKB_p), jnp.float32)
            for _ in range(plan.A)
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET if interpret else False,
    )(ints, scal, u_sm, p_sm)
    S = S.reshape(plan.Kpad_p)
    if plan.anti:
        S = S[_anti_perm(plan.Kpad_p, plan.KBp)]
    return S


def _planar_noise_dump_kernel(
    ints_ref,   # SMEM (1, 4)
    scal_ref,   # SMEM (1, 5)
    e_ref,      # out VMEM (1, A, SUB, KB): this (t, tile)'s per-dim ε blocks
    *ep_scrs,   # A × VMEM (SUB, KB): OU e_{t−1} per dim
    plan: PallasPlan,
):
    """Planar kernel D: replay the planar PRNG stream to HBM (dims drawn in
    the same 0..A−1 per-step order as :func:`_planar_rollout_S`)."""
    i, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed(ints_ref[0, 0], ints_ref[0, 1], i)
        for scr in ep_scrs:
            scr[:, :] = jnp.zeros_like(scr)

    sid = _kernel_sid(ints_ref[0, 0], plan)
    for dim in range(plan.A):
        n = _planar_draw(t, i, dim, plan.KBp, plan.anti, plan.testmode, sid)
        if plan.ou:
            beta, c = scal_ref[0, 3], scal_ref[0, 4]
            e = jnp.where(t == 0, n, beta * ep_scrs[dim][:, :] + c * n)
            ep_scrs[dim][:, :] = e
        else:
            e = n
        e_ref[0, dim] = e


def _planar_noise_dump(dyn, cost, x0, U, key, sigma, plan: PallasPlan,
                       ou_beta: float, interpret: bool) -> jax.Array:
    """(T, K, a) ε tensor of the PLANAR stream in rollout-rank order —
    bit-identical to what :func:`_planar_fused_solve` consumed."""
    ints, scal, _, _ = _planar_pack(dyn, cost, x0, U, key, sigma, plan, ou_beta=ou_beta)
    e = pl.pallas_call(
        functools.partial(_planar_noise_dump_kernel, plan=plan),
        grid=(plan.grid_p, plan.T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, plan.A, SUB, plan.KBp), lambda i, t: (t, 0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (plan.T, plan.A, SUB, plan.Kpg_p), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, plan.KBp), jnp.float32) for _ in range(plan.A)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),  # sequential: PRNG state
        ),
        interpret=_INTERPRET if interpret else False,
    )(ints, scal)
    # (T, A, SUB, Kpg_p) → (T, Kpad_p, A): rank k = row·Kpg_p + flat-lane
    eps = jnp.transpose(e, (0, 2, 3, 1)).reshape(plan.T, plan.Kpad_p, plan.A)
    if plan.anti:
        eps = eps[:, _anti_perm(plan.Kpad_p, plan.KBp), :]
    sig = jnp.broadcast_to(sigma, (plan.A,)).astype(jnp.float32)
    return (sig * eps)[:, : plan.K, :]


def planar_fake_noise_tensor(
    plan: PallasPlan, sigma, ou_beta: float = 0.0, key: jax.Array | None = None
) -> jax.Array:
    """Host twin of the PLANAR testmode noise: (T, Kpad_p, A) ε in
    rollout-rank order (the planar analog of :func:`fake_noise_tensor`)."""
    assert plan.testmode and plan.planar
    T, A, KB, Kpg = plan.T, plan.A, plan.KBp, plan.Kpg_p
    sid = _seed_stream_id(key if key is not None else jax.random.key(0))
    k = _anti_perm(plan.Kpad_p, KB) if plan.anti else jnp.arange(plan.Kpad_p)
    row, rem = k // Kpg, k % Kpg
    tile, lane = rem // KB, rem % KB
    if plan.anti:
        half = KB // 2
        sign = jnp.where(lane < half, 1.0, -1.0)
        lane = jnp.where(lane < half, lane, lane - half)
    else:
        sign = jnp.ones_like(lane, jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)[:, None, None]
    dim = jnp.arange(A, dtype=jnp.float32)[None, None, :]
    n = sign[None, :, None] * jnp.sin(
        0.917 * t + 0.379 * lane[None, :, None].astype(jnp.float32)
        + 1.37 * row[None, :, None].astype(jnp.float32)
        + 2.11 * tile[None, :, None].astype(jnp.float32)
        + 0.547 * sid + _PLANAR_DIM_SALT * dim
    )                                                         # (T, Kpad_p, A)
    if ou_beta:
        c = (1.0 - ou_beta**2) ** 0.5

        def body(prev, nt):
            e = ou_beta * prev + c * nt
            return e, e

        _, tail = jax.lax.scan(body, n[0], n[1:])
        n = jnp.concatenate([n[:1], tail], axis=0)
    return jnp.broadcast_to(sigma, (A,)) * n


def _fleet_fused_solve_kernel(
    ints_ref,   # SMEM (R, 4) int32: per-robot [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)] (shared)
    u_ref,      # VMEM (1, SUB, Tpad): robot r's nominal U block
    p_ref,      # VMEM (1, SUB, NP): robot r's family parameter pack
    s_ref,      # out VMEM (1, G, KB) blocks: robot r's per-rollout costs
    du_ref,     # out VMEM (1, SUB, Tpad): robot r's ΔU
    sw_scr,     # VMEM scratch (G, Kpg): S/weights — re-used by every robot
    acc_scr,    # VMEM scratch (SUB, Tpad): ΔU accumulator, zeroed per robot
    *, plan: PallasPlan,
):
    """The fleet solve: grid (R, 2·nk+1) — for each robot r, the SAME
    [A-tiles | softmin | B-tiles] phase sequence as :func:`_fused_solve_kernel`,
    through the SAME phase bodies. All per-robot data (x0, U, goal, seed)
    arrives via BlockSpec index maps on axis 0 / the SMEM seed row, so the
    phase math is untouched; the scratch buffers are recycled robot to robot
    (each robot fully overwrites sw_scr in its phase A and re-zeroes acc_scr
    at its i == 0). This is what makes the fused backend fleet-capable where
    `jax.vmap` cannot be (the grid axis IS the batch axis)."""
    r, i = pl.program_id(0), pl.program_id(1)
    KB, nk = plan.KB, plan.grid
    lam = scal_ref[0, 2]
    seeds = (ints_ref[r, 0], ints_ref[r, 1], ints_ref[r, 2])
    u_all, p = u_ref[0], p_ref[0]

    @pl.when(i == 0)
    def _():
        du_ref[0] = jnp.zeros_like(acc_scr)
        acc_scr[:, :] = jnp.zeros_like(acc_scr)

    @pl.when(i < nk)
    def _():  # ---- phase A: rollout costs for robot r, tile i
        S = _rollout_phase_S(i, seeds, scal_ref, u_all, p, plan)
        s_ref[0] = S
        sw_scr[:, pl.ds(pl.multiple_of(i * KB, LANE), KB)] = S

    @pl.when(i == nk)
    def _():  # ---- softmin in place (robot-local: S → w)
        _softmin_phase(sw_scr, lam, plan)

    @pl.when(i > nk)
    def _():  # ---- phase B: ΔU accumulation for robot r, tile j = i − nk − 1
        j = i - nk - 1
        w = sw_scr[:, pl.ds(pl.multiple_of(j * KB, LANE), KB)]  # (G, KB)
        acc_scr[:, :] += _update_phase_acc(
            j, w, seeds, scal_ref, u_all, p, plan
        )

        @pl.when(i == 2 * nk)
        def _():
            du_ref[0] = acc_scr[:, :]


def _planar_fleet_solve(dyn, cost, xs, Us, keys, sigma, lambda_,
                        plan: PallasPlan, ou_beta, interpret, cost_axes):
    """Planar fleet core: (S (R, Kpad_p) rank-ordered, ΔU (R, T, a))."""
    R, T, A = Us.shape

    def pack1(c, x0, U, key):
        return _planar_pack(
            dyn, c, x0, U, key, sigma, plan,
            softmin_lambda=lambda_, ou_beta=ou_beta,
        )

    ints, scal, u_sm, p_sm = jax.vmap(pack1, in_axes=(cost_axes, 0, 0, 0))(
        cost, xs, Us, keys
    )
    ints = ints.reshape(R, 4)
    scal = scal[0]  # (1, 5): fleet-wide by construction
    S, dU = pl.pallas_call(
        functools.partial(_planar_fleet_onepass_kernel, plan=plan),
        grid=(R, plan.grid_p),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # robot r's (T, A) nominal sequence windowed into SMEM — scalar
            # per-step reads exactly like the single-robot planar kernel
            # (a VMEM table would need a (1,1)->(8,KB) vector broadcast,
            # which Mosaic cannot lower)
            pl.BlockSpec((1, T, A), lambda r, i: (r, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUB, plan.KBp), lambda r, i: (r, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, plan.Tpad), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, SUB, plan.Kpg_p), jnp.float32),
            jax.ShapeDtypeStruct((R, SUB, plan.Tpad), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((plan.Tc, SUB, plan.stageKB_p), jnp.float32) for _ in range(plan.A)]
            + [pltpu.SMEM((1, 2), jnp.float32), pltpu.VMEM((SUB, plan.Tpad), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),  # sequential: scratch reuse
        ),
        interpret=_INTERPRET if interpret else False,
    )(ints, scal, p_sm, u_sm)
    S = S.reshape(R, plan.Kpad_p)
    if plan.anti:
        S = S[:, _anti_perm(plan.Kpad_p, plan.KBp)]
    return S, jnp.swapaxes(dU[:, :A, :T], 1, 2)  # (R, T, a)


def _planar_fleet_onepass_kernel(
    ints_ref,   # SMEM (R, 4) int32: per-robot [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32 (fleet-wide)
    p_ref,      # SMEM (R, A, NP) f32: per-robot per-dim parameter packs
    u_sm,       # SMEM (1, T, A): robot r's nominal sequence (windowed)
    s_ref,      # out VMEM (1, SUB, KB): robot r's tile-i costs
    du_ref,     # out VMEM (1, SUB, Tpad): robot r's ΔU
    *scratches, # A × VMEM (Tc, SUB, KB) ε stages, SMEM (1,2) run, VMEM acc
    plan: PallasPlan,
):
    """Planar fleet solve: grid (R, grid_p) — robot r's planar online-softmin
    sweep, per-robot data via the SMEM seed/param rows and a BlockSpec-
    windowed SMEM view of robot r's nominal sequence (scalar per-step
    reads, as in the single-robot planar kernel)."""
    eps_scrs = scratches[: plan.A]
    run_scr, acc_scr = scratches[plan.A], scratches[plan.A + 1]
    r, i = pl.program_id(0), pl.program_id(1)
    lam = scal_ref[0, 2]
    seeds = (ints_ref[r, 0], ints_ref[r, 1], ints_ref[r, 2])

    @pl.when(i == 0)
    def _():
        acc_scr[:, :] = jnp.zeros_like(acc_scr)
        run_scr[0, 0] = jnp.float32(BIG)   # β_run
        run_scr[0, 1] = jnp.float32(0.0)   # η_run

    S = _planar_rollout_S(
        i, seeds, scal_ref,
        lambda t, d: u_sm[0, t, d],
        lambda d, c: p_ref[r, d, c],
        plan, eps_scrs,
    )
    s_ref[0] = S
    _online_softmin_step(
        S, lam, run_scr, acc_scr,
        lambda w: _planar_update_from_buf(w, eps_scrs, plan),
    )

    @pl.when(i == plan.grid_p - 1)
    def _():
        du_ref[0] = acc_scr[:, :] * (1.0 / run_scr[0, 1])


def _fleet_onepass_solve_kernel(
    ints_ref,   # SMEM (R, 4) int32: per-robot [seed0, seed1, K, T]
    scal_ref,   # SMEM (1, 5) f32:  [dt, cost λ, softmin λ, OU β, √(1−β²)] (shared)
    u_ref,      # VMEM (1, SUB, Tpad): robot r's nominal U block
    p_ref,      # VMEM (1, SUB, NP): robot r's family parameter pack
    *rest,      # [u3_ref (1, T, SUB, LANE): robot r's lane-replicated U
                # table — plan.u3 only. ~4·T·SUB·LANE bytes (0.8 MB at T=200)
                # of HBM per robot, DMA'd once per robot per solve (the index
                # map is constant in i) — fine to R~10³; the planar fleet
                # kernel shows the leaner alternative (SMEM-windowed (T, A)
                # scalar reads). At long T (plan.u3 False) the kernel
                # one-hot-extracts U[t] from u_ref instead.]
                # + s_ref (out VMEM (1, G, KB) blocks: robot r's tile-i costs)
                # + du_ref (out VMEM (1, SUB, Tpad): robot r's ΔU)
                # + eps_scr (VMEM scratch (Tc, SUB, KB): ε stage, per tile)
                # + run_scr (SMEM scratch (1, 2) f32: robot [β_run, η_run])
                # + acc_scr (VMEM scratch (SUB, Tpad): robot's Σ w̃ ε)
    plan: PallasPlan,
):
    """One-pass fleet solve: grid (R, nk) — robot r's online-softmin sweep
    over its K-tiles, the SAME per-tile body as :func:`_onepass_solve_kernel`
    (rollout stages ε in VMEM, running β/η rescale, chunked weighted
    update). Per-robot data arrives via BlockSpec index maps on axis 0 /
    the SMEM seed row; the scratch state resets at each robot's i == 0, so
    the scratch buffers recycle robot to robot exactly like the two-pass
    fleet kernel's."""
    rest = list(rest)
    u3_ref = rest.pop(0) if plan.u3 else None
    s_ref, du_ref, eps_scr, run_scr, acc_scr = rest
    r, i = pl.program_id(0), pl.program_id(1)
    lam = scal_ref[0, 2]
    seeds = (ints_ref[r, 0], ints_ref[r, 1], ints_ref[r, 2])
    u_all, p = u_ref[0], p_ref[0]

    @pl.when(i == 0)
    def _():
        acc_scr[:, :] = jnp.zeros_like(acc_scr)
        run_scr[0, 0] = jnp.float32(BIG)   # β_run
        run_scr[0, 1] = jnp.float32(0.0)   # η_run

    S = _rollout_phase_S(i, seeds, scal_ref, u_all, p, plan,
                         eps_out=eps_scr,
                         u3_at=(lambda t: u3_ref[0, t]) if plan.u3 else None)
    s_ref[0] = S
    _online_softmin_step(
        S, lam, run_scr, acc_scr,
        lambda w: _update_phase_from_buf(w, eps_scr, plan),
    )

    @pl.when(i == plan.grid - 1)
    def _():
        du_ref[0] = acc_scr[:, :] * (1.0 / run_scr[0, 1])


def pallas_fleet_solve_core(
    dyn,                 # dynamics shared by the fleet (a registered family)
    cost,                # matching cost; leaves may carry a leading R axis
    xs: jax.Array,       # (R, s) per-robot states
    Us: jax.Array,       # (R, T, a) per-robot nominal sequences
    keys: jax.Array,     # (R,) per-robot PRNG keys
    sigma: jax.Array,
    lambda_: jax.Array,
    *,
    K: int,              # rollouts PER ROBOT
    antithetic: bool = False,
    ou_beta: float = 0.0,
    testmode: bool = False,
    interpret: bool = False,
    cost_axes=None,      # vmap in_axes pytree for `cost` (None = shared)
) -> tuple[jax.Array, jax.Array]:
    """R independent MPPI solve cores in ONE kernel launch:
    (S (R, Kpad), ΔU (R, T, a)). The TPU-native fleet mode — R robots × K
    rollouts with zero HBM noise traffic, where the scan fleet (`jax.vmap`)
    materializes R·T·K·a noise floats. Per-robot goals ride the cost pytree
    exactly as in :class:`mppi_gpu_tpu.batched.BatchedMPPIController`
    (pass its vmap axes as `cost_axes`). Single-chip path."""
    R, T, A = Us.shape
    fam_name = family_for(dyn, cost)
    plan = make_plan(
        K, T, A, antithetic, ou_beta, testmode,
        family=fam_name, extra=_plan_extra(FAMILIES[fam_name], cost),
    )
    if cost_axes is None:
        cost_axes = jax.tree_util.tree_map(lambda _: None, cost)

    if plan.planar:
        return _planar_fleet_solve(
            dyn, cost, xs, Us, keys, sigma, lambda_, plan, ou_beta,
            interpret, cost_axes,
        )

    def pack1(c, x0, U, key):
        return pack_inputs(
            dyn, c, x0, U, key, sigma, plan,
            softmin_lambda=lambda_, ou_beta=ou_beta,
        )

    ints, scal, u, p = jax.vmap(pack1, in_axes=(cost_axes, 0, 0, 0))(
        cost, xs, Us, keys
    )
    ints = ints.reshape(R, 4)
    scal = scal[0]  # (1, 5): dt/λ/OU are fleet-wide by construction
    NP = _np_cols(FAMILIES[plan.family], plan)
    nk = plan.grid
    common = dict(
        out_shape=(
            jax.ShapeDtypeStruct((R, plan.G, plan.Kpg), jnp.float32),
            jax.ShapeDtypeStruct((R, SUB, plan.Tpad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),  # sequential: scratch reuse
        ),
        interpret=_INTERPRET if interpret else False,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, SUB, plan.Tpad), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUB, NP), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
    ]
    if plan.onepass:
        inputs = (ints, scal, u, p)
        fleet_in_specs = list(in_specs)
        if plan.u3:
            # per-robot lane-replicated U tables for the leading-dim step read
            u3 = jnp.broadcast_to(
                jnp.swapaxes(u[:, :, : plan.T], 1, 2)[:, :, :, None],
                (R, plan.T, SUB, LANE),
            )
            inputs = inputs + (u3,)
            fleet_in_specs.append(
                pl.BlockSpec((1, plan.T, SUB, LANE), lambda r, i: (r, 0, 0, 0), memory_space=pltpu.VMEM)
            )
        S, dU = pl.pallas_call(
            functools.partial(_fleet_onepass_solve_kernel, plan=plan),
            grid=(R, nk),
            in_specs=fleet_in_specs,
            out_specs=(
                pl.BlockSpec((1, plan.G, plan.KB), lambda r, i: (r, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SUB, plan.Tpad), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((plan.Tc, SUB, plan.stageKB), jnp.float32),
                pltpu.SMEM((1, 2), jnp.float32),
                pltpu.VMEM((SUB, plan.Tpad), jnp.float32),
            ],
            **common,
        )(*inputs)
    else:
        S, dU = pl.pallas_call(
            functools.partial(_fleet_fused_solve_kernel, plan=plan),
            grid=(R, 2 * nk + 1),
            in_specs=in_specs,
            out_specs=(
                # phase-A tiles write their block; later phases re-flush robot
                # r's last block with identical content (harmless, as in the
                # single-robot fused kernel)
                pl.BlockSpec(
                    (1, plan.G, plan.KB),
                    lambda r, i: (r, 0, jnp.minimum(i, plan.grid - 1)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, SUB, plan.Tpad), lambda r, i: (r, 0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((plan.G, plan.Kpg), jnp.float32),
                pltpu.VMEM((SUB, plan.Tpad), jnp.float32),
            ],
            **common,
        )(ints, scal, u, p)
    S = S.reshape(R, plan.Kpad)
    if plan.anti:
        S = S[:, anti_rank_perm(plan)]  # rank order per robot
    return S, jnp.swapaxes(dU[:, :A, :T], 1, 2)  # (R, T, a)
