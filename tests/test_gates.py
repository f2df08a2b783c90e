"""Gate evaluator golden tests.

Fixture: a (localConstants, localWires, piHash) snapshot from a real
recursive-step circuit with expected unfiltered constraint outputs for 11
gates (ported from reference plonk/gates/gates_test.go:16-760 into
testdata/gates_golden.json).  numSelectors = 3 (decode_block's selector
config), so gates see localConstants[3:].
"""
import json

import numpy as np
import jax
import pytest

from plonky2_tpu.gates import gates as G
from plonky2_tpu.fields import goldilocks as gl

FIX = json.load(open("testdata/gates_golden.json"))
NUM_SELECTORS = 3


def qe_pack(pairs):
    """[[c0, c1], ...] -> stacked QE array with shape (1, n)."""
    a = np.array([[c0 for c0, _ in pairs]], dtype=np.uint64)
    b = np.array([[c1 for _, c1 in pairs]], dtype=np.uint64)

    def split(x):
        return ((x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (x >> np.uint64(32)).astype(np.uint32))

    return (split(a), split(b))


def qe_unpack(arr):
    """Stacked QE array (1, n) -> list of [c0, c1] python-int pairs."""
    def u(x):
        return (np.asarray(x[0], np.uint64)[0]
                | (np.asarray(x[1], np.uint64)[0] << np.uint64(32)))
    c0 = u(arr[0])
    c1 = u(arr[1])
    return [[int(a), int(b)] for a, b in zip(c0, c1)]


CONSTS = qe_pack(FIX["localConstants"][NUM_SELECTORS:])
WIRES = qe_pack(FIX["localWires"])
PIH = (np.zeros((1, 4), np.uint32), np.zeros((1, 4), np.uint32))

COSET_WEIGHTS = [17293822565076172801, 18374686475376656385,
                 18446744069413535745, 281474976645120, 17592186044416,
                 18446744069414584577, 18446744000695107601,
                 18446744065119617025, 1152921504338411520, 72057594037927936,
                 18446744069415632897, 18446462594437939201,
                 18446726477228539905, 18446744069414584065, 68719476720,
                 4294967296]

CASES = [
    (G.PublicInputGate(), "publicInputGateExpectedConstraints"),
    (G.BaseSumGate(63, 2), "baseSumGateExpectedConstraints"),
    (G.ArithmeticGate(20), "arithmeticGateExpectedConstraints"),
    (G.RandomAccessGate(4, 4, 2), "randomAccessGateExpectedConstraints"),
    (G.PoseidonGate(), "poseidonGateExpectedConstraints"),
    (G.ArithmeticExtensionGate(10), "arithmeticExtensionGateExpectedConstraints"),
    (G.MulExtensionGate(13), "mulExtensionGateExpectedConstraints"),
    (G.ReducingExtensionGate(33), "reducingExtensionGateExpectedConstraints"),
    (G.ReducingGate(44), "reducingGateExpectedConstraints"),
    (G.CosetInterpolationGate(4, 6, COSET_WEIGHTS),
     "cosetInterpolationGateExpectedConstraints"),
    (G.PoseidonMdsGate(), "poseidonMdsGateExpectedConstraints"),
]


@pytest.mark.parametrize("gate,key", CASES, ids=[k for _, k in CASES])
def test_gate_golden(gate, key):
    fn = jax.jit(lambda c, w, p: gate.eval(c, w, p))
    got = qe_unpack(fn(CONSTS, WIRES, PIH))
    want = FIX[key]
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (key, i, g, w)
