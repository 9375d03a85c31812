"""At-scale restraint prep ON the accelerator.

Why this exists: restraint prep is O(L^2) *elementwise* work (IF^alpha, the
%.1f quantization, separation/validity masks, stress weights) — exactly the
kind of full-lane VPU math the solve kernels already do, and a rounding
error next to one anneal step. But the reference-semantics host path
(restraints.if_to_dist -> dist_to_restraints -> ops.energy builders) makes
dozens of float64 passes over (L, L) numpy arrays, and on this class of
host (single-vCPU VM, ~0.1 GB/s effective memory bandwidth) that measured
313 s at L = 8192 and ~45 min at L = 24576 — an order of magnitude LONGER
than the L = 24576 solve it feeds (5.0 s). The fix is the same design rule
the solver follows (DESIGN.md "what stays off the accelerator", inverted):
per-element work at a BUCKETED shape belongs on the device, because the
compile is paid once per bucket while the host pays per element per run.

So the at-scale paths build their tiles here: ONE padded (L_pad, L_pad)
f32 host->device transfer, then a single jitted program produces the
two-tensor ExactRestraints form (ops/energy.py:51). Scalar knobs (alpha,
K, the stress exponent p) ride as device scalars so hyperparameter sweeps
share the compiled program; only (L_pad, weighting, separation) are static.
Programs are keyed by the PADDED shape only — the same compile-count
discipline as PipelineConfig.length_buckets (CLAUDE.md: one bucket = one
program).

The reference-scale paths (L <= the length buckets) keep the float64 host
route: its %.1f text-file round-trip is byte-parity-tested against the
reference's own Perl (chromosome3D.pl:110-206), and at those sizes host
prep costs milliseconds. This module is gated to beyond-bucket L, where no
text artifacts exist to be parity-locked (f32-vs-f64 quantization can
differ only for distances within ~1e-6 of a .05 decimal midpoint).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from chromosome3d_tpu.ops.energy import ExactRestraints


def pad_f32(a, L_pad: int):
    """Zero-pad to (L_pad, L_pad) f32 in ONE host pass (the only O(L^2) host
    work the device-prep path pays). An already-padded f32 jax array passes
    straight through — callers that generate input ON device (the scaling
    bench) never round-trip it to the host."""
    if (
        isinstance(a, jnp.ndarray)
        and a.shape == (L_pad, L_pad)
        and a.dtype == jnp.float32
    ):
        return a
    a = np.asarray(a)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        # a (L_pad, L)-shaped array would otherwise slip through the
        # passthrough above and trace the prep program at a wrong shape
        raise ValueError(f"pad_f32 needs a square matrix, got {a.shape}")
    L = a.shape[0]
    if L == L_pad and a.dtype == np.float32:
        return np.ascontiguousarray(a)
    out = np.zeros((L_pad, L_pad), np.float32)
    out[:L, :L] = a
    return out


def _run_prog(prog, args: tuple, tag: str, statics: str):
    """Dispatch a prep program through the AOT executable cache when
    CHROM3D_AOT_CACHE is set (utils/aot.py). The at-scale prep programs
    compile through the same remote tunnel as the solve programs, so a
    fresh process re-running a known bucket shape should skip the compile
    for the PREP too, not just the solve — otherwise the cold-start win
    the solve blobs buy is bounded by the prep's compile. Disabled (no
    env var): the plain jitted callable, jax's in-process cache applies."""
    from chromosome3d_tpu.utils.aot import load_or_compile

    return load_or_compile(prog, args, tag, statics=statics)(*args)


def _weights_from_target(t, p, weighting: str):
    """Device mirror of ops.energy._restraint_weights for exact restraints:
    mask is recoverable as t > 0 (quantized targets are >= 0.1 wherever a
    restraint exists; padding and masked-out cells are exactly 0)."""
    m = (t > 0.0).astype(jnp.float32)
    if weighting == "relative":
        w = m * jnp.power(jnp.maximum(t, 1.0), -p)
        denom = jnp.sum(w, dtype=jnp.float32) / jnp.maximum(
            jnp.sum(m, dtype=jnp.float32), 1.0
        )
        return w / jnp.maximum(denom, 1e-30)
    if weighting == "absolute":
        return m
    raise ValueError(f"unknown weighting {weighting!r}")


@functools.lru_cache(maxsize=16)
def _tiles_from_target_prog(weighting: str, out_dtype: str = "float32"):
    # donate t: the output target IS the input (zero-copy aliasing) — at the
    # ceiling sizes every live (L, L) buffer counts (callers never reuse the
    # uploaded array). With out_dtype="bfloat16" the alias is lost (dtype
    # differs) but the donated buffer is still reusable scratch.
    @functools.partial(jax.jit, donate_argnums=0)
    def prog(t, p):
        w = _weights_from_target(t, p, weighting)
        if out_dtype != "float32":
            dt = jnp.dtype(out_dtype)
            t, w = t.astype(dt), w.astype(dt)
        return ExactRestraints(target=t, w=w)

    return prog


def exact_tiles_from_target_device(
    target: np.ndarray,
    L_pad: int,
    weighting: str,
    weight_exponent: float,
    sharding=None,
    out_dtype: str = "float32",
) -> ExactRestraints:
    """(L, L) masked target (zero where no restraint) -> the two-tensor
    ExactRestraints form at (L_pad, L_pad), weights computed on device.

    Drop-in for `exact_restraints_from_numpy(r.padded(L_pad), ...)` when the
    caller has proven exactness: same weighting semantics, one upload and
    ~L_pad^2 * 4 host bytes touched instead of ~10 float64 host passes.
    (f32 weight math; the f64 host path differs by ~1e-7 relative — below
    the solver's own f32 resolution. tests/test_device_prep.py pins it.)

    sharding: optional jax.sharding.NamedSharding (row spec, e.g.
    P("beads", None)) — the padded upload goes straight to its per-device
    row slices and the tiles are BORN distributed (GSPMD propagates the row
    sharding through the program; the relative-weighting mean is one
    all-reduce). Without this, a multi-chip caller would materialize the
    whole (L, L) on one device before shard_map redistributes — the exact
    failure mode the sharded solver exists to avoid.

    out_dtype: "bfloat16" emits bf16-STORED tiles (see _tiles_from_if_body)."""
    t = pad_f32(target, L_pad)
    t = jnp.asarray(t) if sharding is None else jax.device_put(t, sharding)
    return _run_prog(
        _tiles_from_target_prog(weighting, str(out_dtype)),
        (t, jnp.float32(weight_exponent)),
        "prep_target",
        f"w={weighting};dt={out_dtype}",
    )


def _tiles_from_if_body(if_padded, n_true, alpha, kscaling, p,
                        separation: int, weighting: str,
                        out_dtype: str = "float32") -> ExactRestraints:
    """One chromosome's L3 prep as a traceable body (shared by the single
    and the vmapped-batch programs)."""
    L_pad = if_padded.shape[0]
    # IF2dist_new (chromosome3D.pl:110-162): d = K * mean(IF^a) / IF^a.
    # The mean is over ALL n_true^2 cells of the true matrix; padding
    # cells are 0 and 0^a == 0, so the padded sum equals the true sum.
    x = jnp.power(if_padded, alpha)
    mean = jnp.sum(x, dtype=jnp.float32) / (n_true * n_true)
    d = jnp.where(x > 0.0, kscaling * mean / jnp.maximum(x, 1e-30), 0.0)
    # the %.1f .dist-file quantization (restraints.quantize_dist);
    # round-half-even like np.round, in f32. The final /10 must be the
    # CORRECTLY-ROUNDED f32 quotient to match the host's
    # f32(round(d*10)/10 in f64) bit-for-bit, but XLA strength-reduces
    # x/10 to x*(1/10) (one ulp off for e.g. 149/10). A compensated
    # two-term product k*hi + k*lo with hi = f32(0.1),
    # lo = f32(0.1 - f64(f32(0.1))) recovers the correctly-rounded
    # quotient — verified exhaustively for k in [0, 2e6]
    # (tests/test_device_prep.py).
    k = jnp.round(d * 10.0)
    q = k * jnp.float32(0.1) + k * jnp.float32(0.1 - float(np.float32(0.1)))
    i = jax.lax.broadcasted_iota(jnp.int32, (L_pad, L_pad), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (L_pad, L_pad), 1)
    n = n_true.astype(jnp.int32)
    mask = (
        (jnp.abs(i - j) >= separation)
        & (i != j)     # host route excludes the diagonal EXPLICITLY
        #                (dist_to_restraints), not via separation >= 1 —
        #                at separation = 0 the routes must still agree
        & (q > 0.0)
        & (i < n)
        & (j < n)
    )
    t = jnp.where(mask, q, 0.0)
    w = _weights_from_target(t, p, weighting)
    if out_dtype != "float32":
        # bf16-STORED tiles (AnnealConfig.pair_bf16 at scale): all prep math
        # and the %.1f quantization stay f32; only the emitted tensors
        # convert (XLA fuses the converts into the producers, so no f32
        # copy outlives the program). Halves the solve's argument HBM AND
        # the per-step tile stream — unlike the in-jit cast, which keeps
        # the f32 originals alive. Mask recovery (t > 0) survives the
        # conversion (quantized targets are >= 0.1; zeros stay zero).
        dt = jnp.dtype(out_dtype)
        t, w = t.astype(dt), w.astype(dt)
    return ExactRestraints(target=t, w=w)


@functools.lru_cache(maxsize=16)
def _tiles_from_if_prog(separation: int, weighting: str,
                        out_dtype: str = "float32"):
    # donate the IF matrix: XLA reuses its buffer for an output tile, so the
    # prep peak is ~3 live (L, L) tensors instead of 4 — this is what decides
    # the single-chip ceiling L (callers never reuse the uploaded matrix)
    @functools.partial(jax.jit, donate_argnums=0)
    def prog(if_padded, n_true, alpha, kscaling, p):
        return _tiles_from_if_body(
            if_padded, n_true, alpha, kscaling, p, separation, weighting,
            out_dtype,
        )

    return prog


@functools.lru_cache(maxsize=16)
def _tiles_from_if_batched_prog(separation: int, weighting: str,
                                out_dtype: str = "float32"):
    # the genome at-scale bucket's prep: one program for the whole
    # (B, L_pad, L_pad) bucket, per-chromosome n_true/p as device vectors
    @functools.partial(jax.jit, donate_argnums=0)
    def prog(if_padded, n_true, alpha, kscaling, p):
        return jax.vmap(
            lambda m, n, pe: _tiles_from_if_body(
                m, n, alpha, kscaling, pe, separation, weighting, out_dtype
            )
        )(if_padded, n_true, p)

    return prog


def exact_tiles_from_if_batched_device(
    matrices,
    L_pad: int,
    rc,
    weighting: str,
    weight_exponents,
    sharding=None,
    out_dtype: str = "float32",
    stack: "np.ndarray | None" = None,
) -> ExactRestraints:
    """Batched exact_tiles_from_if_device for a genome bucket: a list of
    (L_b, L_b) IF matrices -> (B, L_pad, L_pad) ExactRestraints, built by
    ONE device program. The single O(B*L_pad^2) host pass is the f32
    pad/stack copy (the minimum any text-matrix input pays); all float64
    prep passes run on the accelerator. weight_exponents: per-chromosome p
    (auto_weight_exponent of each TRUE length). sharding: a (chrom, beads)
    NamedSharding — the stacked upload goes straight to per-device slices
    and the bucket's tiles are born distributed.

    out_dtype: "bfloat16" emits bf16-STORED tiles for the solve (see
    _tiles_from_if_body). Host assessment must NOT read those — bf16-
    rounded targets would reach the violation reports — so bf16 callers
    (run_genome with pair_bf16) free the solve tiles and re-invoke this at
    f32 for the assessment view, the same two-program split as the
    run/solve/serve surfaces (pipeline._assessment_view_from_if).

    stack: optional prebuilt (B, L_pad, L_pad) f32 pad/stack — callers
    that prep the same bucket more than once (the bf16 two-program split,
    alpha ensembles) pass it so the O(B*L_pad^2) host copy runs ONCE, the
    same pad-once-and-thread discipline as pipeline's if_dev. The device
    upload donates only the device buffer; the host array stays valid
    across calls."""
    B = len(matrices)
    if stack is None:
        stack = np.zeros((B, L_pad, L_pad), np.float32)
        for b, m in enumerate(matrices):
            Lb = m.shape[0]
            stack[b, :Lb, :Lb] = np.asarray(m, np.float32)
    elif stack.shape != (B, L_pad, L_pad) or stack.dtype != np.float32:
        raise ValueError(
            f"prebuilt stack {stack.shape}/{stack.dtype} does not match "
            f"({B}, {L_pad}, {L_pad}) float32"
        )
    x = jnp.asarray(stack) if sharding is None else jax.device_put(stack, sharding)
    prog = _tiles_from_if_batched_prog(
        int(rc.separation), weighting, str(out_dtype)
    )
    return _run_prog(
        prog,
        (
            x,
            jnp.asarray([m.shape[0] for m in matrices], jnp.float32),
            jnp.float32(rc.alpha),
            jnp.float32(rc.kscaling),
            jnp.asarray(np.asarray(weight_exponents, np.float32)),
        ),
        "prep_if_bucket",
        f"sep={int(rc.separation)};w={weighting};dt={out_dtype}",
    )


def exact_tiles_from_if_device(
    if_matrix: np.ndarray,
    L_pad: int,
    rc,
    weighting: str,
    weight_exponent: float,
    sharding=None,
    out_dtype: str = "float32",
    n_true: int | None = None,
) -> ExactRestraints:
    """Full L3 restraint generation on device: (L, L) IF matrix ->
    ExactRestraints at (L_pad, L_pad). Mirrors if_to_dist + quantize_dist +
    dist_to_restraints for the pipeline's own (always-exact) restraints;
    alpha/K/p are device scalars, so alpha-ensemble sweeps reuse the
    compiled program. Static keys: (L_pad, separation, weighting) only.

    sharding: like exact_tiles_from_target_device — the padded IF upload
    goes straight to per-device row slices and the tiles are born
    distributed (the global mean is one all-reduce under GSPMD).
    out_dtype: "bfloat16" emits bf16-STORED tiles (see _tiles_from_if_body)
    — a distinct compiled program from the f32 one.
    n_true: the matrix's TRUE length when if_matrix arrives PRE-PADDED to
    (L_pad, L_pad) f32 (pad_f32 passes such arrays through) — callers that
    invoke this several times on one matrix (solve prep + alpha ensemble +
    the f32 assessment view) pad once and thread the copy; each pad is an
    O(L^2) host pass (~25 s at L = 24576 on this ~0.1 GB/s host)."""
    prog = _tiles_from_if_prog(int(rc.separation), weighting, str(out_dtype))
    m = pad_f32(if_matrix, L_pad)
    return _run_prog(
        prog,
        (
            jnp.asarray(m) if sharding is None else jax.device_put(m, sharding),
            jnp.float32(if_matrix.shape[0] if n_true is None else n_true),
            jnp.float32(rc.alpha),
            jnp.float32(rc.kscaling),
            jnp.float32(weight_exponent),
        ),
        "prep_if",
        f"sep={int(rc.separation)};w={weighting};dt={out_dtype}",
    )
