"""Symbolic verification of the moment-basis backward algebra.

The Pallas backward kernel (ops/render.py::_bwd_kernel) never materialises
per-pixel gradient fields: every per-splat gradient is reduced through ONE
(6, 256) moment matmul of q against the fixed pixel basis
{1, up, vp, up^2, vp^2, up*vp}, followed by (1, CHUNK) row algebra.  The
f64-oracle check_grads suite (tests/test_render_grads.py) pins the numbers;
this script pins the ALGEBRA — it verifies, with sympy and exact rational
arithmetic, that each identity the kernel relies on holds symbolically.
It plays the role of the reference's analytic_diff.ipynb
(/root/reference/analytic_diff.ipynb; derivations in the reference's
MATH.md:341-499) for our TPU-specific reduction layout.

Run: python experiments/verify_backward_algebra.py   (pure sympy, no JAX)

Verified identities, in kernel order:

1. Compositing VJP (the A*tpref - D*roma line, ops/render.py::_bwd_kernel):
   for out[ch] = sum_i rgb[i,ch] * alpha_i * T_i + bg[ch] * T_n with
   T_i = prod_{j<i} (1 - alpha_j),
       dL/dalpha_i = A_i * T_i - D_i / (1 - alpha_i)
   where A_i = sum_ch g[ch] * rgb[i,ch],
         D_i = e - sum_{j<=i} A_j * alpha_j * T_j,
         e   = sum_ch g[ch] * out[ch]    (gi row 3, e_col).

2. Central-moment shift (mu/mv/muu/mvv/muv from raw moments of r = -q/2
   against tile-local pixel coords):  mu == sum_p r_p du_p  etc., with
   du = up - ul, dv = vp - vl.

3. The six gradient rows (gu, gv, gop, ga, gb, gc) equal the true
   derivative sum_p galpha_p * d(alpha_p)/d(param), with
   alpha = op * exp(-mh/2), mh = (c du^2 - 2 b du dv + a dv^2)/(ac - b^2),
   q_p = galpha_p * alpha_p — differentiating through rdet's dependence
   on (a, b, c) exactly as the reference's conic backward does
   (MATH.md:341-387).

4. The mx=True MXU decomposition (ops/render.py::_alpha_terms): the six
   per-splat coefficient rows K contracted with the pixel basis reproduce
   -mh/2 exactly.
"""

import sympy as sp


def check(name, expr_a, expr_b):
    diff = sp.simplify(sp.expand(expr_a - expr_b))
    ok = diff == 0
    print(f"  {'PASS' if ok else 'FAIL'}  {name}")
    if not ok:
        print("    residual:", diff)
        raise SystemExit(1)


def verify_compositing(n=4, n_ch=2):
    print(f"[1] compositing VJP, {n} splats + background, {n_ch} channels")
    alpha = sp.symbols(f"alpha0:{n}", positive=True)
    rgb = [sp.symbols(f"rgb{i}_0:{n_ch}") for i in range(n)]
    bg = sp.symbols(f"bg0:{n_ch}")
    g = sp.symbols(f"g0:{n_ch}")  # upstream dL/dout per channel

    def T(i):  # exclusive prefix transmittance
        t = sp.Integer(1)
        for j in range(i):
            t *= 1 - alpha[j]
        return t

    out = [
        sum(rgb[i][ch] * alpha[i] * T(i) for i in range(n))
        + bg[ch] * T(n)
        for ch in range(n_ch)
    ]
    L = sum(g[ch] * out[ch] for ch in range(n_ch))
    e = L  # e_col: g contracted with the full composite output
    A = [sum(g[ch] * rgb[i][ch] for ch in range(n_ch)) for i in range(n)]
    for i in range(n):
        pg_incl = sum(A[j] * alpha[j] * T(j) for j in range(i + 1))
        D = e - pg_incl
        kernel_form = A[i] * T(i) - D / (1 - alpha[i])
        check(f"dL/dalpha_{i} == A*tpref - D*roma", sp.diff(L, alpha[i]),
              kernel_form)


def _mh_terms():
    ul, vl, op, a, b, c = sp.symbols("ul vl op a b c")
    up, vp = sp.symbols("up vp")
    du, dv = up - ul, vp - vl
    det = a * c - b * b
    mh = (c * du**2 - 2 * b * du * dv + a * dv**2) / det
    alpha = op * sp.exp(-mh / 2)
    return ul, vl, op, a, b, c, up, vp, du, dv, det, mh, alpha


def verify_moments(n_px=3):
    print(f"[2] central-moment shift identities, {n_px} symbolic pixels")
    ul, vl = sp.symbols("ul vl")
    ups = sp.symbols(f"up0:{n_px}")
    vps = sp.symbols(f"vp0:{n_px}")
    rs = sp.symbols(f"r0:{n_px}")  # r_p = dL/dmh at pixel p ( = -q_p/2 )

    # raw moments exactly as T6 = basis^T r
    m1 = sum(rs)
    su = sum(r * u for r, u in zip(rs, ups))
    sv = sum(r * v for r, v in zip(rs, vps))
    suu = sum(r * u * u for r, u in zip(rs, ups))
    svv = sum(r * v * v for r, v in zip(rs, vps))
    suv = sum(r * u * v for r, u, v in zip(rs, ups, vps))

    # kernel's central-moment lines (ops/render.py, _bwd_kernel)
    mu = su - ul * m1
    mv = sv - vl * m1
    muu = suu - ul * (2 * su - ul * m1)
    mvv = svv - vl * (2 * sv - vl * m1)
    muv = suv - ul * sv - vl * (su - ul * m1)

    du = [u - ul for u in ups]
    dv = [v - vl for v in vps]
    check("mu  == sum r*du", mu, sum(r * d for r, d in zip(rs, du)))
    check("mv  == sum r*dv", mv, sum(r * d for r, d in zip(rs, dv)))
    check("muu == sum r*du^2", muu, sum(r * d * d for r, d in zip(rs, du)))
    check("mvv == sum r*dv^2", mvv, sum(r * d * d for r, d in zip(rs, dv)))
    check("muv == sum r*du*dv", muv,
          sum(r * x * y for r, x, y in zip(rs, du, dv)))

    a, b, c = sp.symbols("a b c")
    det = a * c - b * b
    smh = (c * muu - 2 * b * muv + a * mvv) / det
    mh = [(c * x**2 - 2 * b * x * y + a * y**2) / det
          for x, y in zip(du, dv)]
    check("smh == sum r*mh", smh, sum(r * m for r, m in zip(rs, mh)))


def verify_gradient_rows(n_px=2):
    """The six rows vs true derivatives, for n_px symbolic pixels."""
    print(f"[3] gradient rows vs sympy autodiff, {n_px} symbolic pixels")
    ul, vl, op, a, b, c = sp.symbols("ul vl op a b c", positive=True)
    ups = sp.symbols(f"up0:{n_px}")
    vps = sp.symbols(f"vp0:{n_px}")
    gas = sp.symbols(f"ga0:{n_px}")  # galpha_p, upstream dL/dalpha_p

    det = a * c - b * b
    rdet = 1 / det

    alphas, qs = [], []
    for u, v in zip(ups, vps):
        du, dv = u - ul, v - vl
        mh = (c * du**2 - 2 * b * du * dv + a * dv**2) * rdet
        alphas.append(op * sp.exp(-mh / 2))
    L = sum(g * al for g, al in zip(gas, alphas))
    qs = [g * al for g, al in zip(gas, alphas)]  # q_p = galpha_p * alpha_p
    rs = [-q / 2 for q in qs]                    # r_p = dL/dmh_p

    # moment pipeline on the symbolic q
    m1 = sum(rs)
    su = sum(r * u for r, u in zip(rs, ups))
    sv = sum(r * v for r, v in zip(rs, vps))
    suu = sum(r * u * u for r, u in zip(rs, ups))
    svv = sum(r * v * v for r, v in zip(rs, vps))
    suv = sum(r * u * v for r, u, v in zip(rs, ups, vps))
    mu = su - ul * m1
    mv = sv - vl * m1
    muu = suu - ul * (2 * su - ul * m1)
    mvv = svv - vl * (2 * sv - vl * m1)
    muv = suv - ul * sv - vl * (su - ul * m1)
    smh = rdet * (c * muu - 2 * b * muv + a * mvv)

    rows = {
        "gu == dL/dul": (-2 * rdet * (c * mu - b * mv), ul),
        "gv == dL/dvl": (-2 * rdet * (a * mv - b * mu), vl),
        "gop == dL/dop": (-2 * m1 / op, op),
        "ga == dL/da": (rdet * (mvv - c * smh), a),
        "gb == dL/db": (2 * rdet * (b * smh - muv), b),
        "gc == dL/dc": (rdet * (muu - a * smh), c),
    }
    for name, (row, var) in rows.items():
        check(name, row, sp.diff(L, var))


def verify_mxu_decomposition():
    print("[4] mx=True basis decomposition of -mh/2")
    ul, vl, op, a, b, c, up, vp, du, dv, det, mh, _ = _mh_terms()
    rdet = 1 / det
    ra, rb, rc = rdet * a, rdet * b, rdet * c
    k0 = rc * ul**2 - 2 * (rb * ul) * vl + ra * vl**2
    K = [-k0 / 2, rc * ul - rb * vl, ra * vl - rb * ul,
         -rc / 2, -ra / 2, rb]
    basis = [sp.Integer(1), up, vp, up**2, vp**2, up * vp]
    nh = sum(kk * bb for kk, bb in zip(K, basis))
    check("basis . K == -mh/2", nh, -mh / 2)


if __name__ == "__main__":
    verify_compositing()
    verify_moments()
    verify_gradient_rows()
    verify_mxu_decomposition()
    print("all identities verified symbolically")
