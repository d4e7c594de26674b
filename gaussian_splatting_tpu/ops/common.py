"""Shared constants and semantics for the tile rasterizer.

The compositing semantics replicated here are those of
render_tiles_kernel (reference: src/render.cu:8-189):

  per pixel, walking the tile's depth-sorted splats front to back:
    - stop once alpha_accum > SATURATION_ACCUM  (T < T_EPS)
    - alpha = opacity * exp(-0.5 * mh_sq) if mh_sq > 0 else 0, where the
      2D covariance gets +0.25 added to its diagonal (fast/f32 mode)
    - splats with alpha < ALPHA_SKIP are skipped entirely (fast mode)
    - weight = alpha * (1 - alpha_accum); colour += rgb * weight
    - background is blended with weight (1 - alpha_accum) only if
      alpha_accum < BACKGROUND_ACCUM at the end
"""

# skip threshold for tiny splats (reference literal, src/render.cu:145)
ALPHA_SKIP = 0.00392156862
# forward early-exit: alpha_accum > 0.9999  <=>  transmittance < 1e-4
# (src/render.cu:106)
T_EPS = 1e-4
# background blended only while alpha_accum < 0.999  <=> T > 1e-3
# (src/render.cu:169)
BG_T_EPS = 1e-3
# backward clamps alpha at 0.9999 before 1/(1-alpha)
# (src/render_backward.cu:170)
ALPHA_CLAMP = 0.9999

# rows of the packed splat-feature matrix (FEAT_ROWS, n_splats):
#   u, v, opacity, a, b_half, c, r, g, b   (a/c carry the +0.25
#   regularisation, b_half = conic[1] / 2; rgb is pre-scaled by SH_0 to
#   match the N_SH=1 rasterizer path, see ops/render.py)
FEAT_U, FEAT_V, FEAT_OPACITY = 0, 1, 2
FEAT_A, FEAT_B, FEAT_C = 3, 4, 5
FEAT_R, FEAT_G, FEAT_B_COL = 6, 7, 8
FEAT_ROWS = 16  # padded to a full f32 sublane pair for clean DMA

# rows of the per-splat gradient matrix emitted by the backward kernel
GRAD_U, GRAD_V, GRAD_OPACITY = 0, 1, 2
GRAD_A, GRAD_B, GRAD_C = 3, 4, 5
GRAD_R, GRAD_G, GRAD_B_COL = 6, 7, 8
GRAD_ROWS = 16
# packed backward output: the 9 gradient rows as 5 bf16-pair i32 rows
# ((gu,gv),(gop,ga),(gb,gc),(gr,gg),(gb,0)), padded to a full i32 sublane
GRAD_PACKED_ROWS = 8

# rows of the per-tile image output (TILE_OUT_ROWS, (n_tiles+1)*256):
#   premultiplied r, g, b and final transmittance
OUT_R, OUT_G, OUT_B, OUT_T = 0, 1, 2, 3
OUT_ROWS = 8

PIXELS_PER_TILE = 256  # 16 x 16
