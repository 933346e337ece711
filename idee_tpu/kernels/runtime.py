# ------------------------------------------------------------------
"""Kernel dispatch control.

Pallas kernels compile only for TPU; every kernel in this package
dispatches through use_pallas(), which is True when the default backend is
TPU and Pallas has not been explicitly disabled. Programs that place
computation on non-default devices (e.g. the multichip dry-run, which
builds a CPU mesh while a TPU is the default backend) must disable Pallas
for that program -- placement is invisible at trace time.
"""
# ------------------------------------------------------------------

import os
from contextlib import contextmanager

import jax

_FORCE_XLA = False
_FORCE_PALLAS = False  # tests: exercise kernels off-TPU via interpret mode

# The round-2 selective-scan kernels passed interpret-mode tests but HUNG
# the real chip (VERDICT r2, weak #1): a fori_loop-carried recurrence with
# dynamic VMEM indexing never returns on silicon and wedges the device for
# minutes.  The round-3 kernels unroll the time loop at trace time (static
# VMEM indices; model windows are L <= 32) with a two-level blocked scan
# for long L, and every Pallas kernel now has an on-silicon smoke check
# (scripts/smoke_kernels.py: 8/8 pass, fwd+grad, 2026-08-17), so the scan
# dispatches to Pallas by default again.  IDEE_SCAN_PALLAS=0 forces the
# XLA associative-scan fallback, =1 forces the kernels.
_SCAN_PALLAS_DEFAULT = True


def use_pallas() -> bool:
    if _FORCE_XLA:
        return False
    if _FORCE_PALLAS:
        return True
    if gspmd_active():
        # Mosaic kernels cannot be automatically partitioned by GSPMD
        # (XLA raises NotImplementedError at lowering — measured by the
        # round-5 Mamba 1x8 AOT probe); under any active device mesh the
        # XLA compositions are the shardable implementations. A future
        # shard_map wrapping could re-enable the kernels per-shard.
        return False
    return jax.default_backend() == "tpu"


def scan_pallas_enabled() -> bool:
    """Gate for the selective-scan kernels specifically (see note above)."""
    if _FORCE_PALLAS:
        return True  # tests exercise the kernel in interpret mode
    env = os.environ.get("IDEE_SCAN_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return _SCAN_PALLAS_DEFAULT


def attn_pallas_enabled() -> bool:
    """Gate for the fused window-attention kernels specifically.

    The round-3 batched/pattern-grouped kernel beats the XLA composition
    in ISOLATION at every stage geometry (scripts/bench_attention.py:
    stage1 fwd+bwd 16.5 ms vs 26.9) but the full train step is still ~6%
    faster with the XLA composition (3.95 vs 3.72 steps/s at the bench
    geometry, 2026-08-18): inside the whole program XLA fuses attention
    into its neighbors while the custom-vjp kernel pays un-fusable
    fold/sort wrapper passes. Default therefore XLA; IDEE_ATTN_PALLAS=1
    opts the kernel in (and =0 forces it off under force_pallas-less
    callers). BASELINE.md "kernel A/B" carries the measurements.
    """
    if _FORCE_PALLAS:
        return True  # tests exercise the kernel in interpret mode
    env = os.environ.get("IDEE_ATTN_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


def attn_xfold_enabled() -> bool:
    """Gate for the pair-folded PURE-XLA window attention.

    Same 128-lane pair folding as the Pallas kernel (16 window*head pairs
    fill one MXU tile; block-diagonal additive bases mask cross-pair
    attention) but expressed as plain jnp einsums so (a) every tensor has
    a perfectly-tiled [tiles, hd, 128] / [tiles, 128, 128] layout -- the
    unfolded composition's [BW, n, G, hd] temps tile-pad 16x -- and
    (b) XLA can fuse it into the surrounding program, which is where the
    custom-vjp Pallas kernel loses its isolated win (see
    attn_pallas_enabled). Measured full-step A/B at the bench geometry
    (2026-08-18, median of 2): unfolded 4.091 steps/s vs folded 3.146
    (-23%) -- the fold's 16x extra MXU work in the dense 128x128 score
    tiles and the f32 [tiles,128,128] score materialization cost more
    than the 16x tile-padding it removes. Stays opt-in via
    IDEE_ATTN_XFOLD=1 as a documented negative result.
    """
    env = os.environ.get("IDEE_ATTN_XFOLD")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


def attn_lanes_enabled() -> bool:
    """Gate for the window-batch-on-lanes PURE-XLA attention.

    Lays every attention tensor out with the huge window-batch axis
    minor ([G, n, hd, BW] / [G, n, n, BW]) and contracts the tiny hd /
    token axes on the VPU as broadcast multiply-reduces -- zero tile
    padding where the unfolded composition pads its (n, hd) minors up
    to 16x (window_attention.py::_xla_lanes).

    DEFAULT ON FOR TPU TARGETS: full-step A/B at the bench geometry
    (200x200, batch 1, bf16, fused-scan, median of 3; 2026-08-19, real
    v5e) measured 6.418 steps/s lanes vs 4.289 unfolded (+50%) -- the
    tile-padding removal wins end-to-end where the pair-fold variants
    lost to their wrapper/extra-MXU costs (see attn_pallas_enabled /
    attn_xfold_enabled). The layout is a (8, 128)-tile optimization, so
    the default follows the same TPU gate as the Pallas kernels
    (use_pallas): on CPU backends -- tests, the multichip dry-run's CPU
    mesh (set_force_xla) -- the unfolded composition stays the default.
    IDEE_ATTN_LANES=0/1 overrides either way; geometries the layout
    cannot take (traced masks, BW % nW != 0) fall through to the
    unfolded composition at dispatch.
    """
    env = os.environ.get("IDEE_ATTN_LANES")
    if env is not None:
        return env not in ("0", "false", "False")
    return not _FORCE_XLA and jax.default_backend() == "tpu"


_SPATIAL_MESH = None  # (mesh, data_axis, space_axis) under spatial GSPMD
_GSPMD_MESH = None    # any active device mesh (data-parallel included)


def set_gspmd_mesh(mesh) -> None:
    """Announce that the program compiles over a device mesh (drivers call
    this whenever cfg.mesh_shape resolves to a mesh). Gates Pallas
    dispatch off — see use_pallas."""
    global _GSPMD_MESH
    _GSPMD_MESH = mesh


def gspmd_active() -> bool:
    return _GSPMD_MESH is not None or _SPATIAL_MESH is not None


def set_spatial_mesh(mesh, data_axis: str = "data",
                     space_axis: str = "space") -> None:
    """Announce an active data x space mesh to the kernel layer.

    GSPMD cannot propagate the height sharding through Swin's
    window-partition reshape (H merges into the window-batch axis), so
    without help every attention temp REPLICATES per device — measured:
    the CERRA 512x832 Swin program is 18.05 GiB/device on a 1x8 space
    mesh, identical to 1x4's 18.02 (round-5 probe, BASELINE.md). With a
    mesh registered here, window_attention constrains its window-batch
    axis to (data, space), which re-establishes the sharding on the far
    side of the reshape. Call with None to clear.
    """
    global _SPATIAL_MESH
    _SPATIAL_MESH = ((mesh, data_axis, space_axis)
                     if mesh is not None else None)


def window_batch_constraint(*tensors):
    """Constrain axis 0 (the window-batch axis BW = B * nW, batch-major)
    of each tensor onto the registered (data, space) mesh axes; identity
    when no spatial mesh is active. Windows enumerate (T, H, W) row-major
    inside each sample, so a contiguous BW shard is a contiguous block of
    H windows — aligned with the H-sharded inputs up to the boundary
    halos GSPMD already exchanges."""
    if _SPATIAL_MESH is None:
        return tensors if len(tensors) > 1 else tensors[0]
    from jax.sharding import NamedSharding, PartitionSpec

    mesh, da, sa = _SPATIAL_MESH
    out = []
    for t in tensors:
        spec = PartitionSpec((da, sa), *([None] * (t.ndim - 1)))
        out.append(jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def set_force_pallas(value: bool) -> None:
    """Route kernels to their Pallas implementations even off-TPU (they run
    in interpret mode there) -- for correctness tests on CPU."""
    global _FORCE_PALLAS
    _FORCE_PALLAS = bool(value)


def set_force_xla(value: bool) -> None:
    global _FORCE_XLA
    _FORCE_XLA = bool(value)


@contextmanager
def force_xla():
    """Temporarily route all kernels to their XLA fallbacks."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev
