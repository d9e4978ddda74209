"""Rasterizer: tile path vs a brute-force per-pixel reference compositor
implementing the CUDA renderCUDA semantics directly, plus gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import (
    GaussianPack,
    build_covariance,
    unstrip_symmetric,
)
from neuma_tpu.render.rasterize import (
    RasterConfig,
    _project,
    rasterize,
)


def make_scene(rng, n=40, size=64):
    pts = 0.4 * rng.standard_normal((n, 3)).astype(np.float32)
    scales = np.log(0.05 + 0.05 * rng.random((n, 3))).astype(np.float32)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    opac = rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    cam = Camera.look_at(
        eye=np.array([0.0, 0.0, -3.0]),
        target=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]),
        fov=0.9,
        width=size,
        height=size,
    )
    cov = build_covariance(jnp.exp(jnp.asarray(scales)), jnp.asarray(quats))
    opacity = jax.nn.sigmoid(jnp.asarray(opac))
    return (
        jnp.asarray(pts),
        cov,
        opacity,
        jnp.asarray(colors),
        cam,
    )


def brute_force_render(means3d, cov3d, opacity, colors, cam, bg):
    """Reference compositor: per-pixel loop over depth-sorted gaussians
    with the exact CUDA guards."""
    depth, visible, mean2d, conic, radius = jax.jit(_project)(
        means3d, cov3d, cam
    )
    depth = np.asarray(depth)
    visible = np.asarray(visible)
    mean2d = np.asarray(mean2d)
    conic = np.asarray(conic)
    radius = np.asarray(radius)
    opacity = np.asarray(opacity).reshape(-1)
    colors = np.asarray(colors)

    H, W = cam.height, cam.width
    order = np.argsort(np.where(visible, depth, np.inf))
    img = np.zeros((3, H, W), np.float64)
    for py in range(H):
        for px in range(W):
            T = 1.0
            C = np.zeros(3)
            tile_x, tile_y = px // 16, py // 16
            for g in order:
                if not visible[g] or radius[g] <= 0:
                    continue
                # CUDA tile-rect culling: a gaussian only reaches pixels
                # whose tile lies in its radius rect (getRect semantics).
                if not (
                    (mean2d[g, 0] - radius[g]) // 16 <= tile_x
                    and tile_x <= (mean2d[g, 0] + radius[g] + 15) // 16 - 1
                    and (mean2d[g, 1] - radius[g]) // 16 <= tile_y
                    and tile_y <= (mean2d[g, 1] + radius[g] + 15) // 16 - 1
                ):
                    continue
                dx = mean2d[g, 0] - px
                dy = mean2d[g, 1] - py
                power = (
                    -0.5 * (conic[g, 0] * dx * dx + conic[g, 2] * dy * dy)
                    - conic[g, 1] * dx * dy
                )
                if power > 0:
                    continue
                alpha = min(0.99, opacity[g] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[g] * alpha * T
                T = test_T
            img[:, py, px] = C + T * np.asarray(bg)
    return img


def test_tile_rasterizer_matches_brute_force(rng):
    means3d, cov, opacity, colors, cam = make_scene(rng, n=30, size=48)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    cfg = RasterConfig(max_pairs=16384, max_per_tile=64, segment=16)
    img = jax.jit(
        lambda m, c, o, col: rasterize(
            m, c, o, cam, bg, colors_precomp=col, cfg=cfg
        )
    )(means3d, cov, opacity, colors)
    ref = brute_force_render(means3d, cov, opacity, colors, cam, bg)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-4)


def test_rasterizer_sh_mode(rng):
    n, size = 20, 32
    means3d, cov, opacity, _, cam = make_scene(rng, n=n, size=size)
    shs = jnp.asarray(
        0.3 * rng.standard_normal((n, 16, 3)), jnp.float32
    )
    bg = jnp.zeros(3)
    cfg = RasterConfig(max_pairs=8192, max_per_tile=32, segment=8)
    img = rasterize(
        means3d, cov, opacity, cam, bg, shs=shs, sh_degree=3, cfg=cfg
    )
    assert img.shape == (3, size, size)
    assert np.all(np.isfinite(np.asarray(img)))
    assert float(jnp.max(img)) > 0.0


def test_rasterizer_gradients(rng):
    means3d, cov, opacity, colors, cam = make_scene(rng, n=12, size=32)
    bg = jnp.zeros(3)
    cfg = RasterConfig(max_pairs=4096, max_per_tile=32, segment=8)
    target = jnp.zeros((3, 32, 32))

    def loss(m, o, col):
        img = rasterize(m, cov, o, cam, bg, colors_precomp=col, cfg=cfg)
        return jnp.mean((img - target) ** 2)

    g_m, g_o, g_c = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        means3d, opacity, colors
    )
    for g in (g_m, g_o, g_c):
        assert np.all(np.isfinite(np.asarray(g)))
    # Colors must receive gradient wherever gaussians are visible.
    assert float(jnp.max(jnp.abs(g_c))) > 0.0
    assert float(jnp.max(jnp.abs(g_m))) > 0.0

    # Finite-difference check on a mean coordinate.
    f0 = float(loss(means3d, opacity, colors))
    eps = 1e-2
    m_np = np.asarray(means3d).copy()
    m_np[0, 0] += eps
    f1 = float(loss(jnp.asarray(m_np), opacity, colors))
    fd = (f1 - f0) / eps
    an = float(g_m[0, 0])
    if abs(fd) > 1e-6:
        np.testing.assert_allclose(an, fd, rtol=0.35, atol=1e-5)


def test_background_compositing(rng):
    # Empty scene: pure background.
    cam = Camera.look_at(
        eye=np.array([0.0, 0.0, -3.0]), target=np.zeros(3), width=32,
        height=32,
    )
    means3d = jnp.zeros((1, 3)) + 100.0  # far outside frustum
    cov = jnp.tile(
        jnp.asarray([[1e-4, 0, 0, 1e-4, 0, 1e-4]], jnp.float32), (1, 1)
    )
    opacity = jnp.ones((1, 1))
    colors = jnp.ones((1, 3))
    bg = jnp.asarray([0.2, 0.4, 0.6])
    cfg = RasterConfig(max_pairs=256, max_per_tile=8, segment=4)
    img = rasterize(
        means3d, cov, opacity, cam, bg, colors_precomp=colors, cfg=cfg
    )
    expected = np.broadcast_to(
        np.asarray(bg)[:, None, None], (3, 32, 32)
    )
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-6)


def test_pair_budget_overflow_signal(rng):
    """A scene exceeding a deliberately tiny pair budget must raise the
    overflow flag (both builders); a generous budget must not."""
    from neuma_tpu.render.rasterize import rasterize_with_aux

    means3d, cov, opacity, colors, cam = make_scene(rng, n=60)
    bg = jnp.zeros(3)
    for backend in ("jnp", "pallas_interpret"):
        # (max_pairs must stay a CHUNK=32 multiple for the pallas layout)
        tiny = RasterConfig(
            max_pairs=32, max_per_tile=8, backend=backend
        )
        _, aux = jax.jit(
            lambda m, c, o: rasterize_with_aux(
                m, c, o, cam, bg, colors_precomp=colors, cfg=tiny
            )
        )(means3d, cov, opacity)
        assert bool(aux["overflow"]), backend
        big = RasterConfig(
            max_pairs=65536, max_per_tile=256, backend=backend
        )
        _, aux = jax.jit(
            lambda m, c, o: rasterize_with_aux(
                m, c, o, cam, bg, colors_precomp=colors, cfg=big
            )
        )(means3d, cov, opacity)
        assert not bool(aux["overflow"]), backend


def test_per_tile_depth_overflow_signal(rng):
    """max_per_tile overflow alone (jnp backend) also fires."""
    from neuma_tpu.render.rasterize import rasterize_with_aux

    means3d, cov, opacity, colors, cam = make_scene(rng, n=60)
    cfg = RasterConfig(max_pairs=65536, max_per_tile=2, backend="jnp")
    _, aux = rasterize_with_aux(
        means3d, cov, opacity, cam, jnp.zeros(3),
        colors_precomp=colors, cfg=cfg,
    )
    assert bool(aux["overflow"])


def test_pair_attributes_run_fill_matches_gather():
    """The run-fill inside _pair_attributes equals direct per-pair
    expansion V[gid] for random run lengths, including empty runs and a
    run straddling the budget edge."""
    from neuma_tpu.render.rasterize import RasterConfig, _pair_attributes

    rng = np.random.default_rng(11)
    n = 40
    tiles_x, tiles_y = 7, 5
    area = rng.integers(0, 20, n)
    area[rng.random(n) < 0.4] = 0  # plenty of empty runs
    offsets = np.cumsum(area).astype(np.int32)
    starts = (offsets - area).astype(np.int32)
    order = rng.permutation(n).astype(np.int32)
    x0s = rng.integers(0, tiles_x, n).astype(np.int32)
    y0s = rng.integers(0, tiles_y, n).astype(np.int32)
    w_t = rng.integers(1, tiles_x + 1, n).astype(np.int32)
    cfg = RasterConfig(max_pairs=256, max_per_tile=16)

    x0p, y0p, twp, pair_orig, pair_start = [
        np.asarray(a)
        for a in _pair_attributes(
            jnp.asarray(order), jnp.asarray(x0s), jnp.asarray(y0s),
            jnp.asarray(w_t), jnp.asarray(starts), jnp.asarray(offsets),
            cfg, tiles_x, tiles_y,
        )
    ]

    # direct expansion
    live = min(int(offsets[-1]), cfg.max_pairs)
    ex_x0 = np.zeros(cfg.max_pairs, np.int32)
    ex_y0 = np.zeros(cfg.max_pairs, np.int32)
    ex_tw = np.zeros(cfg.max_pairs, np.int32)
    ex_orig = np.zeros(cfg.max_pairs, np.int32)
    ex_start = np.zeros(cfg.max_pairs, np.int32)
    for g in range(n):
        a, b = starts[g], min(offsets[g], cfg.max_pairs)
        ex_x0[a:b] = x0s[g]
        ex_y0[a:b] = y0s[g]
        ex_tw[a:b] = w_t[g]
        ex_orig[a:b] = order[g]
        ex_start[a:b] = starts[g]
    np.testing.assert_array_equal(x0p[:live], ex_x0[:live])
    np.testing.assert_array_equal(y0p[:live], ex_y0[:live])
    np.testing.assert_array_equal(twp[:live], ex_tw[:live])
    np.testing.assert_array_equal(pair_orig[:live], ex_orig[:live])
    np.testing.assert_array_equal(pair_start[:live], ex_start[:live])


def test_builders_agree_at_realcapture_resolution():
    """tile_mat and the aligned-pair layout contain the same per-tile
    gaussian lists at 1920x1080 (exercises the packed-geometry run-fill
    at 120x68 tiles)."""
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import (
        RasterConfig,
        _build_aligned_pairs,
        _build_tile_lists,
        _project,
    )
    from neuma_tpu.render.pallas_raster import CHUNK

    rng = np.random.default_rng(5)
    n, w, h = 2000, 1920, 1080
    pts = (0.35 + 0.3 * rng.random((n, 3))).astype(np.float32)
    pack = create_from_points(
        pts, rng.random((n, 3)).astype(np.float32), sh_degree=0
    )
    cam = Camera.look_at(
        eye=np.array([0.5, 0.55, -1.8]),
        target=np.array([0.5, 0.5, 0.5]),
        fov=0.9,
        width=w,
        height=h,
    )
    cfg = RasterConfig(max_pairs=1 << 17, max_per_tile=1024)
    depth, vis, m2d, conic, radius = jax.jit(
        lambda m: _project(m, pack.get_covariance(), cam)
    )(jnp.asarray(pts))

    tile_mat, tiles_x, tiles_y, ovf1 = jax.jit(
        lambda *a: _build_tile_lists(*a, w, h, cfg)
    )(depth, vis, m2d, radius)
    pair_gid, tile_counts, tile_start, tx2, ty2, ovf2, _ = jax.jit(
        lambda *a: _build_aligned_pairs(*a, w, h, cfg)
    )(depth, vis, m2d, radius)
    assert (tiles_x, tiles_y) == (tx2, ty2) == (120, 68)
    assert not bool(ovf1) and not bool(ovf2)

    tile_mat = np.asarray(tile_mat)
    pair_gid = np.asarray(pair_gid)
    tile_counts = np.asarray(tile_counts)
    tile_start = np.asarray(tile_start)
    # Both builders emit per-tile DEPTH-ordered lists -> lists match
    # elementwise, not just as sets. Valid slots are the first
    # tile_counts[t] of each aligned range (pad slots carry arbitrary
    # ids and are masked by the kernels).
    rng_t = np.random.default_rng(0)
    for t in rng_t.integers(0, tiles_x * tiles_y, 200):
        a = tile_start[t]
        lst = list(pair_gid[a : a + tile_counts[t]])
        ref = [g for g in tile_mat[t] if g >= 0]
        assert lst == ref, (t, lst[:5], ref[:5])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_builders_agree_fuzz(seed):
    """Random scenes/budgets: the aligned-pair layout always matches the
    tile-matrix builder per tile (depth order included), and the
    overflow flags agree about the pair budget — including budgets at
    and just below the exact pair count."""
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import (
        RasterConfig,
        _build_aligned_pairs,
        _build_tile_lists,
        _project,
        _tile_ranges,
    )

    r = np.random.default_rng(100 + seed)
    n = int(r.integers(50, 400))
    w = int(r.integers(4, 14)) * 16
    h = int(r.integers(4, 14)) * 16
    pts = (0.3 + 0.4 * r.random((n, 3))).astype(np.float32)
    pack = create_from_points(
        pts, r.random((n, 3)).astype(np.float32), sh_degree=0
    )
    cam = Camera.look_at(
        eye=np.array([0.5, 0.6, -1.5 - r.random()]),
        target=np.array([0.5, 0.5, 0.5]),
        fov=0.7 + 0.4 * r.random(),
        width=w,
        height=h,
    )
    depth, vis, m2d, conic, radius = jax.jit(
        lambda m: _project(m, pack.get_covariance(), cam)
    )(jnp.asarray(pts))

    x0, y0, x1, y1, tx, ty = _tile_ranges(m2d, radius, w, h)
    area = jnp.where(vis & (radius > 0), (x1 - x0) * (y1 - y0), 0)
    total = int(area.sum())
    if total == 0:
        pytest.skip("nothing visible")

    ceil32 = -(-total // 32) * 32
    floor32 = max((total - 1) // 32 * 32, 32)
    cases = [(ceil32, False), (ceil32 + 64, False)]
    if floor32 < total:
        cases.append((floor32, True))
    for max_pairs, expect_ovf in cases:
        cfg = RasterConfig(max_pairs=max_pairs, max_per_tile=1024)
        tile_mat, tiles_x, tiles_y, ovf1 = jax.jit(
            lambda *a: _build_tile_lists(*a, w, h, cfg)
        )(depth, vis, m2d, radius)
        pair_gid, tile_counts, tile_start, _, _, ovf2, _ = jax.jit(
            lambda *a: _build_aligned_pairs(*a, w, h, cfg)
        )(depth, vis, m2d, radius)
        assert bool(ovf2) == expect_ovf, (max_pairs, total)
        if expect_ovf:
            continue  # layouts may drop pairs, only the flag matters
        tile_mat = np.asarray(tile_mat)
        pair_gid = np.asarray(pair_gid)
        tile_counts = np.asarray(tile_counts)
        tile_start = np.asarray(tile_start)
        for t in range(tiles_x * tiles_y):
            a, b = tile_start[t], tile_start[t + 1]
            lst = list(pair_gid[a : a + tile_counts[t]])
            ref = [g for g in tile_mat[t] if g >= 0]
            assert lst == ref, (seed, max_pairs, t)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_counting_binner_matches_sort_binner(seed):
    """pair_binning='counting' (two-level counting sort + direct
    placement) produces BIT-IDENTICAL tile matrices and aligned-pair
    layouts to the global packed-key sort, including with per-tile
    depth truncation (max_per_tile) in play."""
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import (
        RasterConfig,
        _build_aligned_pairs,
        _build_tile_lists,
        _project,
    )

    r = np.random.default_rng(300 + seed)
    n = int(r.integers(200, 900))
    w = int(r.integers(6, 16)) * 16
    h = int(r.integers(6, 16)) * 16
    pts = (0.3 + 0.4 * r.random((n, 3))).astype(np.float32)
    pack = create_from_points(
        pts, r.random((n, 3)).astype(np.float32), sh_degree=0
    )
    cam = Camera.look_at(
        eye=np.array([0.5, 0.6, -1.4 - r.random()]),
        target=np.array([0.5, 0.5, 0.5]),
        fov=0.8,
        width=w,
        height=h,
    )
    depth, vis, m2d, conic, radius = jax.jit(
        lambda m: _project(m, pack.get_covariance(), cam)
    )(jnp.asarray(pts))

    for max_pairs, max_per_tile in [(1 << 13, 1024), (1 << 14, 8)]:
        cfgs = {
            mode: RasterConfig(
                max_pairs=max_pairs,
                max_per_tile=max_per_tile,
                pair_binning=mode,
            )
            for mode in ("counting", "sort")
        }
        outs = {
            mode: jax.jit(
                lambda *a, c=cfg: _build_tile_lists(*a, w, h, c)
            )(depth, vis, m2d, radius)
            for mode, cfg in cfgs.items()
        }
        np.testing.assert_array_equal(
            np.asarray(outs["counting"][0]),
            np.asarray(outs["sort"][0]),
            err_msg=f"tile_mat (budget {max_pairs}/{max_per_tile})",
        )
        assert bool(outs["counting"][3]) == bool(outs["sort"][3])

        al = {
            mode: jax.jit(
                lambda *a, c=cfg: _build_aligned_pairs(*a, w, h, c)
            )(depth, vis, m2d, radius)
            for mode, cfg in cfgs.items()
        }
        for i, name in [(1, "tile_counts"), (2, "tile_start")]:
            np.testing.assert_array_equal(
                np.asarray(al["counting"][i]),
                np.asarray(al["sort"][i]),
                err_msg=f"{name} (budget {max_pairs})",
            )
        # pair_gid: pad slots past each tile's true count carry
        # binner-specific arbitrary ids — compare the valid prefixes.
        gc = np.asarray(al["counting"][0])
        gs = np.asarray(al["sort"][0])
        starts = np.asarray(al["counting"][2])
        cnts = np.asarray(al["counting"][1])
        for t in range(len(cnts)):
            a = starts[t]
            np.testing.assert_array_equal(
                gc[a : a + cnts[t]], gs[a : a + cnts[t]],
                err_msg=f"pair_gid tile {t} (budget {max_pairs})",
            )
        assert bool(al["counting"][5]) == bool(al["sort"][5])


@pytest.mark.parametrize("binning", ["counting", "sort"])
def test_segsum_pair_grad_matches_scatter(binning):
    """pair_grad='segsum' (scatter-free segmented-reduction transpose of
    the pair-feature gather) produces the same gradients as AD's
    scatter-add transpose, through the full Pallas-layout render, for
    both pair-binning strategies."""
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import RasterConfig, rasterize

    r = np.random.default_rng(7)
    n, img = 300, 64
    pts = (0.4 + 0.2 * r.random((n, 3))).astype(np.float32)
    pack = create_from_points(
        pts, r.random((n, 3)).astype(np.float32), sh_degree=0
    )
    cam = Camera.look_at(
        eye=np.array([0.5, 0.55, -1.6]),
        target=np.array([0.5, 0.5, 0.5]),
        fov=0.8,
        width=img,
        height=img,
    )
    cov = pack.get_covariance()
    opac = pack.get_opacity
    x = jnp.asarray(pts)
    bg = jnp.zeros(3)
    cp = jnp.ones((n, 3), jnp.float32)

    def make(pair_grad):
        cfg = RasterConfig(
            max_pairs=1 << 11,
            max_per_tile=256,
            backend="pallas_interpret",
            pair_grad=pair_grad,
            pair_binning=binning,
        )

        def loss(m, csc, osc, col):
            im = rasterize(
                m, cov * csc, opac * osc, cam, bg,
                colors_precomp=cp * col, cfg=cfg,
            )
            return jnp.sum(im ** 2)

        return loss

    args = (x, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    v1, g1 = jax.value_and_grad(make("scatter"), argnums=(0, 1, 2, 3))(
        *args
    )
    v2, g2 = jax.value_and_grad(make("segsum"), argnums=(0, 1, 2, 3))(
        *args
    )
    assert np.allclose(float(v1), float(v2), rtol=0, atol=0)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-5
        )
