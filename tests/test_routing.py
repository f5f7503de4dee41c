"""Pins for the explicit per-code kernel routing table (ops/routing.py).

VERDICT r4 item 5: production dispatch used to be keyed on structural
fingerprints (`has_pi and M == 512 and sumA <= 15`, M-ladders); a new
code or an edited prototype would silently inherit a tile or variant
measured for a DIFFERENT code. These tests pin every code's resolved
(layout, tile, lane_parts) to its measured-best value and pin the
fail-loudly contract for unrouted codes.
"""

import pytest

from labrador_ldpc_tpu.codes.expand import qc_structure
from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.codes.params import ALL_CODES as _ALL

ALL_CODES = [c.name for c in _ALL]
from labrador_ldpc_tpu.ops.routing import ROUTES, route_for
from labrador_ldpc_tpu.sizes import decoder_memory

# The measured-best production routes, restated literally (provenance in
# ops/routing.py's docstring). An edit to ROUTES that is not mirrored
# here — or a code added without a measurement — fails this pin.
EXPECTED = {
    #          ms_layout     ms_tile parts  bf_layout     bf_tile
    "TC128": ("node_major", 512, False, "node_major", 1024),
    "TC256": ("node_major", 512, False, "node_major", 512),
    "TC512": ("node_major", 512, False, "node_major", 1024),
    "TM1280": ("node_major", 256, False, "node_major", 256),
    "TM1536": ("node_major", 256, False, "node_major", 256),
    "TM2048": ("lane_major", 256, True, "lane_major", 256),
    "TM5120": ("lane_major", 128, False, "lane_major", 256),
    "TM6144": ("lane_major", 128, False, "lane_major", 128),
    "TM8192": ("lane_major", 64, False, "lane_major", 128),
}


def test_every_code_routed():
    assert set(ROUTES) == set(ALL_CODES) == set(EXPECTED)


@pytest.mark.parametrize("name", ALL_CODES)
def test_route_values_pinned(name):
    r = route_for(name)
    exp = EXPECTED[name]
    assert (
        r.ms_layout,
        r.ms_batch_tile,
        r.ms_lane_parts,
        r.bf_layout,
        r.bf_batch_tile,
    ) == exp


@pytest.mark.parametrize("name", ALL_CODES)
def test_route_agrees_with_layout_boundary(name):
    """The table's layouts must agree with the documented M-boundary laws
    (pallas_tc.ms_node_major / bf_node_major): both are claims about the
    same measurements, so divergence means one of them rotted."""
    from labrador_ldpc_tpu.ops.pallas_tc import bf_node_major, ms_node_major

    M = get_code(name).submatrix_size
    r = route_for(name)
    assert r.ms_layout == ("node_major" if ms_node_major(M) else "lane_major")
    assert r.bf_layout == ("node_major" if bf_node_major(M) else "lane_major")


def test_unknown_code_fails_loudly():
    # a route must never be guessed for an unmeasured code; get_code
    # itself rejects unknown names first, so fake one past it and check
    # route_for's error message carries the remediation
    import labrador_ldpc_tpu.ops.routing as routing

    class _Fake:
        name = "TCFAKE"

    orig = routing.get_code
    routing.get_code = lambda c: _Fake()
    try:
        with pytest.raises(KeyError, match="never inherit another code's"):
            route_for("TCFAKE")
    finally:
        routing.get_code = orig


@pytest.mark.parametrize("name", ALL_CODES)
@pytest.mark.parametrize("impl", ["pallas_qc", "pallas_layered", "pallas_bf"])
def test_sizes_defaults_follow_table(name, impl):
    """decoder_memory's default tile (the number every VMEM table row and
    docs/MEMORY.md derive from) is the routed production tile."""
    r = route_for(name)
    mem = decoder_memory(name, impl)
    want = r.bf_batch_tile if impl == "pallas_bf" else r.ms_batch_tile
    assert mem.batch_tile == want


def test_lane_parts_routing():
    """Only TM2048 carries lane parts, and _lane_part_fns honors the flag
    rather than fingerprinting the structure (ADVICE r4)."""
    from labrador_ldpc_tpu.ops.pallas_qc import _lane_part_fns

    assert [n for n in ALL_CODES if route_for(n).ms_lane_parts] == ["TM2048"]
    s = qc_structure(get_code("TM2048"))
    P_on, q_on, _, _ = _lane_part_fns(s, True)
    P_off, q_off, _, _ = _lane_part_fns(s, False)
    assert (P_on, q_on) == (4, s.m // 4)
    assert (P_off, q_off) == (1, s.m)
