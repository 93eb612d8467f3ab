"""CPU-checkable guards for the Pallas kernel's compile-time configuration.

CI runs interpret=True where `_compiler_params` returns None, so without
these tests a pltpu.CompilerParams API drift (or a cap/limit inconsistency)
would only surface as a confusing Mosaic error on real hardware.
"""
import os

from taxoexpan_tpu.ops.pallas_gat import (_compiler_params, _pick_tile,
                                          _vmem_cap_bytes)


def _with_cap(mb, fn):
    old = os.environ.get("TAXOEXPAN_VMEM_CAP_MB")
    os.environ["TAXOEXPAN_VMEM_CAP_MB"] = str(mb)
    try:
        return fn()
    finally:
        if old is None:
            del os.environ["TAXOEXPAN_VMEM_CAP_MB"]
        else:
            os.environ["TAXOEXPAN_VMEM_CAP_MB"] = old


def test_compiler_params_constructs_on_cpu():
    # interpret mode never builds CompilerParams; make sure the compiled-mode
    # path at least constructs (catches jax API drift without a TPU)
    cp = _compiler_params(True)
    assert cp is None
    cp = _compiler_params(False)
    assert cp is not None
    assert cp.vmem_limit_bytes == 100 * 1024 * 1024  # floor at default cap


def test_compiler_limit_tracks_env_cap():
    # raising the tile cap must raise the Mosaic scoped-vmem limit with it
    # (2x headroom, clamped to 128 MiB physical), otherwise large-tile
    # experiments fail at compile
    cp = _with_cap(60, lambda: _compiler_params(False))
    assert cp.vmem_limit_bytes == 2 * 60 * 1024 * 1024
    cp = _with_cap(96, lambda: _compiler_params(False))
    assert cp.vmem_limit_bytes == 128 * 1024 * 1024
    assert _with_cap(60, _vmem_cap_bytes) == 60 * 1024 * 1024


def test_pick_tile_monotone_in_cap():
    # bench first-layer shape: B=4096 egonets, N=64 slots, Din=300, H*Dh=2000
    small = _with_cap(10, lambda: _pick_tile(4096, 64, 300, 2000))
    big = _with_cap(64, lambda: _pick_tile(4096, 64, 300, 2000))
    assert 1 <= small <= big <= 32
    assert big == 32  # 64 MB fits the largest tile at this shape
    # backward (factor=2) never exceeds the forward tile at equal cap
    bwd = _with_cap(64, lambda: _pick_tile(4096, 64, 300, 2000, factor=2))
    assert bwd <= big


def test_default_cap_is_swept_best():
    # hardware-swept default (scripts/vmem_cap_sweep.py, round 2): 24 MB
    old = os.environ.pop("TAXOEXPAN_VMEM_CAP_MB", None)
    try:
        assert _vmem_cap_bytes() == 24 * 1024 * 1024
    finally:
        if old is not None:
            os.environ["TAXOEXPAN_VMEM_CAP_MB"] = old


def test_bwd_cap_env_decouples_backward_tiles():
    from taxoexpan_tpu.ops.pallas_gat import _vmem_cap_bwd_bytes
    old = os.environ.pop("TAXOEXPAN_VMEM_CAP_BWD_MB", None)
    try:
        # defaults to the forward cap
        assert _vmem_cap_bwd_bytes() == _vmem_cap_bytes()
        os.environ["TAXOEXPAN_VMEM_CAP_BWD_MB"] = "48"
        assert _vmem_cap_bwd_bytes() == 48 * 1024 * 1024
        # factor=2 picks from the backward cap: TB matches the fwd pick at
        # half the budget
        fwd = _with_cap(24, lambda: _pick_tile(4096, 64, 300, 2000))
        bwd = _with_cap(24, lambda: _pick_tile(4096, 64, 300, 2000, factor=2))
        assert bwd == fwd  # 48 MB bwd budget == 24 MB fwd budget at factor 2
        # compiler limit respects the larger cap
        cp = _with_cap(24, lambda: _compiler_params(False))
        assert cp.vmem_limit_bytes == 100 * 1024 * 1024
    finally:
        del os.environ["TAXOEXPAN_VMEM_CAP_BWD_MB"]
        if old is not None:
            os.environ["TAXOEXPAN_VMEM_CAP_BWD_MB"] = old
