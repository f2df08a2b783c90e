"""BN254 field + Poseidon-BN254 permutation tests.

Golden permutation vectors from reference poseidon/bn254_test.go:41-88.
"""
import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.fields import bn254
from plonky2_tpu.hash import poseidon_bn254 as pb

P = bn254.P
RNG = np.random.default_rng(42)

_mont_mul = jax.jit(bn254.mont_mul)
_add = jax.jit(bn254.add)
_permute = jax.jit(pb.permute)


def pack(ints):
    return jnp.asarray(np.array([bn254.int_to_limbs(x) for x in ints],
                                dtype=np.uint32))


def unpack(arr):
    arr = np.asarray(arr, dtype=np.uint64)
    out = []
    for row in arr.reshape(-1, 16):
        out.append(bn254.limbs_to_int(row))
    return out


def test_mont_mul_random():
    n = 50
    xs = [int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) % P for _ in range(n)]
    ys = [int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) * int(RNG.integers(0, 2**62)) % P for _ in range(n)]
    xs += [0, 1, P - 1, P - 2, bn254.R_MOD_P]
    ys += [P - 1, 0, P - 1, 7, bn254.R_MOD_P]
    got = unpack(_mont_mul(pack(xs), pack(ys)))
    rinv = pow(bn254.R, -1, P)
    for x, y, g in zip(xs, ys, got):
        assert g == (x * y * rinv) % P


def test_add():
    xs = [0, 1, P - 1, P - 2, 12345, P // 2, P // 2 + 1]
    ys = [0, P - 1, P - 1, 1, P - 12345, P // 2, P // 2]
    got = unpack(_add(pack(xs), pack(ys)))
    for x, y, g in zip(xs, ys, got):
        assert g == (x + y) % P


def _permute_canonical_batch(states):
    """states: list of 4-element canonical int lists -> same, permuted."""
    mont = [[(x * bn254.R) % P for x in s] for s in states]
    st = jnp.stack([pack(s) for s in mont])  # (B, 4, 16)
    out = _permute(st)
    one = pack([1] * 4)
    out_canon = _mont_mul(out, one)  # leave Montgomery domain
    return [unpack(row) for row in out_canon]


def test_poseidon_bn254_vectors():
    # reference poseidon/bn254_test.go:41-88
    cases = [
        ([0, 0, 0, 0],
         [5317387130258456662214331362918410991734007599705406860481038345552731150762,
          17768273200467269691696191901389126520069745877826494955630904743826040320364,
          19413739268543925182080121099097652227979760828059217876810647045303340666757,
          3717738800218482999400886888123026296874264026760636028937972004600663725187]),
        ([0, 1, 2, 3],
         [6542985608222806190361240322586112750744169038454362455181422643027100751666,
          3478427836468552423396868478117894008061261013954248157992395910462939736589,
          1904980799580062506738911865015687096398867595589699208837816975692422464009,
          11971464497515232077059236682405357499403220967704831154657374522418385384151]),
        ([P - 1, P - 1, P - 1, P - 1],
         [13055670547682322550638362580666986963569035646873545133474324633020685301274,
          19087936485076376314486368416882351797015004625427655501762827988254486144933,
          10391468779200270580383536396630001155994223659670674913170907401637624483385,
          17202557688472898583549180366140168198092766974201433936205272956998081177816]),
        ([6542985608222806190361240322586112750744169038454362455181422643027100751666,
          3478427836468552423396868478117894008061261013954248157992395910462939736589,
          1904980799580062506738911865015687096398867595589699208837816975692422464009,
          11971464497515232077059236682405357499403220967704831154657374522418385384151],
         [21792249080447013894140672594027696524030291802493510986509431008224624594361,
          3536096706123550619294332177231935214243656967137545251021848527424156573335,
          14869351042206255711434675256184369368509719143073814271302931417334356905217,
          5027523131326906886284185656868809493297314443444919363729302983434650240523]),
    ]
    got = _permute_canonical_batch([c[0] for c in cases])
    for (inputs, want), g in zip(cases, got):
        assert g == want, (inputs[0], g, want)


def test_two_to_one_batch_shape():
    l = pack([(123 * bn254.R) % P, (456 * bn254.R) % P])
    r = pack([(789 * bn254.R) % P, (1011 * bn254.R) % P])
    out = jax.jit(pb.two_to_one)(l, r)
    assert out.shape == (2, 16)
    # matches permute of assembled state
    z = bn254.zeros((2,))
    st = jnp.stack([z, z, l, r], axis=-2)
    want = _permute(st)[..., 0, :]
    assert (np.asarray(out) == np.asarray(want)).all()
