#!/usr/bin/env python3
"""Pure-python reference transcript for debugging: computes the decode_block
challenges from proof JSON using int arithmetic, to compare against the
pinned vectors (reference fri/fri_test.go:36-67)."""
import json
import sys

sys.path.insert(0, "/root/repo")
from plonky2_tpu.hash import poseidon_gl_constants as K

P = (1 << 64) - (1 << 32) + 1


def permute(state):
    state = list(state)

    def sbox(x):
        return pow(x, 7, P)

    rc = K.ALL_ROUND_CONSTANTS
    round_ctr = 0
    for r in range(4):
        for i in range(12):
            state[i] = (state[i] + rc[12 * round_ctr + i]) % P
        state = [sbox(x) for x in state]
        state = mds(state)
        round_ctr += 1
    for i in range(12):
        state[i] = (state[i] + K.FAST_PARTIAL_FIRST_ROUND_CONSTANT[i]) % P
    new = [state[0]] + [0] * 11
    for d in range(1, 12):
        acc = 0
        for r in range(1, 12):
            acc += state[r] * K.FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][d - 1]
        new[d] = acc % P
    state = new
    for r in range(22):
        s0 = sbox(state[0])
        if r < 21:
            s0 = (s0 + K.FAST_PARTIAL_ROUND_CONSTANTS[r]) % P
        d = 25 * s0
        for i in range(1, 12):
            d += state[i] * K.FAST_PARTIAL_ROUND_W_HATS[r][i - 1]
        new = [d % P]
        for i in range(1, 12):
            new.append((s0 * K.FAST_PARTIAL_ROUND_VS[r][i - 1] + state[i]) % P)
        state = new
    round_ctr += 22
    for r in range(4):
        for i in range(12):
            state[i] = (state[i] + rc[12 * round_ctr + i]) % P
        state = [sbox(x) for x in state]
        state = mds(state)
        round_ctr += 1
    return state


def mds(state):
    circ, diag = K.MDS_MATRIX_CIRC, K.MDS_MATRIX_DIAG
    out = []
    for r in range(12):
        acc = 0
        for i in range(12):
            acc += state[(i + r) % 12] * circ[i]
        acc += state[r] * diag[r]
        out.append(acc % P)
    return out


class Challenger:
    def __init__(self):
        self.state = [0] * 12
        self.inp = []
        self.out = []

    def observe(self, e):
        self.out = []
        self.inp.append(e % P)
        if len(self.inp) == 8:
            self._duplex()

    def _duplex(self):
        for i, v in enumerate(self.inp):
            self.state[i] = v
        self.inp = []
        self.state = permute(self.state)
        self.out = list(self.state[:8])

    def get(self):
        if self.inp or not self.out:
            self._duplex()
        return self.out.pop()


def tovec(v):
    return [(int(v) >> (56 * i)) & ((1 << 56) - 1) for i in range(5)]


def main():
    d = "/root/repo/testdata/decode_block"
    pf = json.load(open(f"{d}/proof_with_public_inputs.json"))["proof"]
    vo = json.load(open(f"{d}/verifier_only_circuit_data.json"))

    c = Challenger()
    for x in tovec(vo["circuit_digest"]):
        c.observe(x)
    for x in [0, 0, 0, 0]:  # pi hash of empty input
        c.observe(x)
    for h in pf["wires_cap"]:
        for x in tovec(h):
            c.observe(x)
    betas = [c.get(), c.get()]
    gammas = [c.get(), c.get()]
    print("beta0", betas[0], betas[0] == 17615363392879944733)
    print("gamma0", gammas[0], gammas[0] == 15174493176564484303)
    for h in pf["plonk_zs_partial_products_cap"]:
        for x in tovec(h):
            c.observe(x)
    alphas = [c.get(), c.get()]
    print("alpha0", alphas[0], alphas[0] == 9276470834414745550)
    for h in pf["quotient_polys_cap"]:
        for x in tovec(h):
            c.observe(x)
    zeta = [c.get(), c.get()]
    print("zeta0", zeta[0], zeta[0] == 3892795992421241388)
    op = pf["openings"]
    for key in ["constants", "plonk_sigmas", "wires", "plonk_zs",
                "partial_products", "quotient_polys", "plonk_zs_next"]:
        for pair in op[key]:
            for x in pair:
                c.observe(x)
    fri_alpha = [c.get(), c.get()]
    print("fri_alpha0", fri_alpha[0], fri_alpha[0] == 885535811531859621)
    for cap in pf["opening_proof"]["commit_phase_merkle_caps"]:
        for h in cap:
            for x in tovec(h):
                c.observe(x)
        beta = [c.get(), c.get()]
        print("fri_beta", beta[0])
    for pair in pf["opening_proof"]["final_poly"]["coeffs"]:
        for x in pair:
            c.observe(x)
    c.observe(pf["opening_proof"]["pow_witness"])
    pow_resp = c.get()
    print("pow", pow_resp, pow_resp == 70715523064019)
    qis = [c.get() for _ in range(28)]
    print("qi0", qis[0], qis[0] == 11890500485816111017)


if __name__ == "__main__":
    main()
