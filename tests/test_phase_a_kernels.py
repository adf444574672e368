"""Phase-A JAX kernels must match the scalar reference semantics exactly."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lepton_tpu.kernels import contexts as K  # noqa: E402
from lepton_tpu.model import context as S  # noqa: E402

QT = [16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99]


@pytest.fixture(scope="module")
def setup():
    colors = S.ColorTables(QT)
    rng = np.random.default_rng(11)
    H, W = 5, 7
    coefs = rng.integers(-80, 81, size=(H, W, 64))
    coefs[rng.random(size=coefs.shape) < 0.6] = 0
    coefs = coefs.astype(np.int16)
    return colors, coefs


def test_idct_matches_scalar(setup):
    colors, coefs = setup
    out = np.asarray(K.idct_blocks(jnp.asarray(coefs),
                                   jnp.asarray(colors.quant, dtype=jnp.int32),
                                   ignore_dc=True))
    for y in range(coefs.shape[0]):
        for x in range(coefs.shape[1]):
            ref = S.idct_block(coefs[y, x], colors.quant, True)
            np.testing.assert_array_equal(out[y, x], ref, err_msg=f"{y},{x}")


def test_summaries_match_scalar(setup):
    colors, coefs = setup
    nz7, edges, pixels = K.neighbor_summaries(
        jnp.asarray(coefs), jnp.asarray(colors.quant, dtype=jnp.int32))
    nz7, edges = np.asarray(nz7), np.asarray(edges)
    q0 = int(colors.quant[0])
    for y in range(coefs.shape[0]):
        for x in range(coefs.shape[1]):
            px = S.idct_block(coefs[y, x], colors.quant, True)
            dc = int(coefs[y, x, 0])
            v = S.set_vertical(px, q0, dc)
            h = S.set_horizontal(px, q0, dc)
            np.testing.assert_array_equal(edges[y, x, :8], v)
            np.testing.assert_array_equal(edges[y, x, 8:], h)
            grid = coefs[y, x].reshape(8, 8)
            assert nz7[y, x] == np.count_nonzero(grid[1:, 1:])


def test_aavrg_matches_scalar(setup):
    colors, coefs = setup
    out = np.asarray(K.aavrg_all(jnp.asarray(coefs)))
    H, W = coefs.shape[:2]
    for y in range(H):
        for x in range(W):
            left = coefs[y, x - 1] if x > 0 else None
            above = coefs[y - 1, x] if y > 0 else None
            al = coefs[y - 1, x - 1] if (x > 0 and y > 0) else None
            for coord in [0, 1, 9, 10, 37, 63]:
                ref = S.compute_aavrg(coord, left, above, al)
                assert out[y, x, coord] == ref, (y, x, coord)


def test_lak_matches_scalar(setup):
    colors, coefs = setup
    out = np.asarray(K.lak_all(
        jnp.asarray(coefs),
        jnp.asarray(colors.icos_idct_edge_8192_dequantized_x,
                    dtype=jnp.int32),
        jnp.asarray(colors.icos_idct_edge_8192_dequantized_y,
                    dtype=jnp.int32)))
    H, W = coefs.shape[:2]
    for y in range(H):
        for x in range(W):
            left = coefs[y, x - 1] if x > 0 else None
            above = coefs[y - 1, x] if y > 0 else None
            for lane in range(7):
                ref = S.compute_lak(lane + 1, coefs[y, x], above, left,
                                    colors)
                assert out[y, x, lane] == ref, ("H", y, x, lane)
                ref = S.compute_lak((lane + 1) * 8, coefs[y, x], above, left,
                                    colors)
                assert out[y, x, 7 + lane] == ref, ("V", y, x, lane)


def test_dc_prediction_matches_scalar(setup):
    colors, coefs = setup
    q = jnp.asarray(colors.quant, dtype=jnp.int32)
    nz7, edges, pixels = K.neighbor_summaries(jnp.asarray(coefs), q)
    pred, unc, unc2 = K.dc_predictions(jnp.asarray(coefs), q, nz7, edges,
                                       pixels)
    pred, unc, unc2 = np.asarray(pred), np.asarray(unc), np.asarray(unc2)
    edges_np = np.asarray(edges)
    H, W = coefs.shape[:2]
    q0 = int(colors.quant[0])
    for y in range(H):
        for x in range(W):
            ls = edges_np[y, x - 1] if x > 0 else None
            as_ = edges_np[y - 1, x] if y > 0 else None
            rp, ru, ru2, _ = S.adv_predict_dc_pix(coefs[y, x], colors, ls, as_)
            assert pred[y, x] == rp, (y, x)
            assert unc[y, x] == ru, (y, x)
            assert unc2[y, x] == ru2, (y, x)


def test_phase_a_planar_equals_reference():
    import numpy as np
    import jax.numpy as jnp
    from lepton_tpu.kernels import contexts as K
    from lepton_tpu.model.context import ColorTables
    qt = np.arange(1, 65).astype(np.int64)
    colors = ColorTables(qt)
    quant = jnp.asarray(colors.quant, dtype=jnp.int32)
    icx = jnp.asarray(colors.icos_idct_edge_8192_dequantized_x,
                      dtype=jnp.int32)
    icy = jnp.asarray(colors.icos_idct_edge_8192_dequantized_y,
                      dtype=jnp.int32)
    rng = np.random.default_rng(11)
    c = rng.integers(-512, 513, size=(9, 13, 64)).astype(np.int16)
    c[rng.random(size=c.shape) < 0.6] = 0
    o1 = K.phase_a_reference(jnp.asarray(c), quant, icx, icy)
    o2 = K.phase_a_planar(jnp.asarray(c), quant, icx, icy)
    for k in o1:
        assert np.array_equal(np.asarray(o1[k]), np.asarray(o2[k])), k


def test_lak_div_exact_domain():
    """The Lakhani f32 divider must equal |n|//d (sign-trunc) over the
    real domain: |pred| < 2^31, 1 <= d <= ~2^21 (icos edge values reach
    8192 * dequant).  Random + boundary-adjacent property test."""
    import jax.numpy as jnp
    from lepton_tpu.kernels import contexts as K

    rng = np.random.default_rng(42)
    n = rng.integers(-(2**31 - 1), 2**31 - 1, 200000, dtype=np.int64)
    d = rng.integers(1, 1 << 21, 200000, dtype=np.int64)
    # boundary-adjacent cases: n within +-2 of a multiple of d
    k = rng.integers(0, 1 << 10, 50000)
    db = rng.integers(1, 1 << 21, 50000)
    for off in (-2, -1, 0, 1, 2):
        n = np.concatenate([n, np.clip(k * db + off, -(2**31 - 1),
                                       2**31 - 1)])
        d = np.concatenate([d, db])
    want = np.sign(n) * (np.abs(n) // d)

    import jax

    @jax.jit
    def f(pred, den):
        # mirror contexts._lak_div exactly
        nn = jnp.abs(pred)
        d32 = den.astype(jnp.float32)
        q = (nn.astype(jnp.float32) / d32).astype(jnp.int32)
        r = nn - q * den
        q = q + (r.astype(jnp.float32) / d32).astype(jnp.int32)
        r = nn - q * den
        q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        r = nn - q * den
        q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        return jnp.sign(pred) * q

    got = np.asarray(f(jnp.asarray(n.astype(np.int32)),
                       jnp.asarray(d.astype(np.int32))))
    bad = np.nonzero(got != want)[0]
    assert len(bad) == 0, (n[bad[:5]], d[bad[:5]], got[bad[:5]],
                           want[bad[:5]])
