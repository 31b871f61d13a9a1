"""Reference torch-ngp checkpoint import: lattice-convention parity + full
model mapping.

The oracle here reimplements the reference CUDA kernel verbatim in numpy
(gridencoder.cu: get_grid_index 55-72, kernel_grid 126-160 — fractional
per-level scale, pos = x*scale + 0.5, d-ascending dense strides, fast_hash,
% hashmap_size) so our `coord_convention="ngp"` encode is checked against
the reference semantics, not against itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfnav_tpu.ops.hashgrid import HashGridConfig, hash_grid_encode

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def ref_offsets(num_levels, level_dim, base, scale, log2):
    """reference grid.py:115-126 (verbatim schedule)."""
    offsets, offset = [], 0
    for i in range(num_levels):
        resolution = int(np.ceil(base * scale**i))
        params_in_level = min(2**log2, (resolution + 1) ** 3)
        params_in_level = int(np.ceil(params_in_level / 8) * 8)
        offsets.append(offset)
        offset += params_in_level
    offsets.append(offset)
    return np.array(offsets, np.int64)


def ref_grid_encode_np(x01, emb, offsets, base, scale, gridtype=0):
    """numpy port of kernel_grid (fp32 weights, fp32 accumulate)."""
    n = x01.shape[0]
    L = len(offsets) - 1
    C = emb.shape[1]
    S = np.log2(scale)
    out = np.zeros((n, L * C), np.float32)
    for lvl in range(L):
        hashmap_size = int(offsets[lvl + 1] - offsets[lvl])
        sc = np.exp2(lvl * S) * base - 1.0
        resolution = int(np.ceil(sc)) + 1
        pos = x01.astype(np.float32) * np.float32(sc) + 0.5
        pg = np.floor(pos).astype(np.uint64)
        frac = pos - pg.astype(np.float32)
        acc = np.zeros((n, C), np.float32)
        for corner in range(8):
            w = np.ones(n, np.float32)
            pl = pg.copy()
            for d in range(3):
                if corner & (1 << d):
                    pl[:, d] += 1
                    w = w * frac[:, d]
                else:
                    w = w * (1.0 - frac[:, d])
            # get_grid_index: accumulate strides while they fit, else hash
            stride = 1
            index = np.zeros(n, np.uint64)
            for d in range(3):
                if stride > hashmap_size:
                    break
                index = index + pl[:, d] * np.uint64(stride)
                stride *= resolution + 1
            if gridtype == 0 and stride > hashmap_size:
                index = np.zeros(n, np.uint64)
                for d in range(3):
                    index = index ^ ((pl[:, d] * _PRIMES[d]) % (2**32))
                index = index % (2**32)
            index = index % np.uint64(hashmap_size)
            acc += w[:, None] * emb[int(offsets[lvl]) + index.astype(np.int64)]
        out[:, lvl * C:(lvl + 1) * C] = acc
    return out


class TestNgpConventionParity:
    @pytest.mark.parametrize("log2,levels", [(12, 6), (15, 8)])
    def test_encode_matches_reference_kernel(self, log2, levels):
        """Mixed dense + hashed levels, random table: our ngp-convention
        encode must match the reference kernel oracle to fp32 tolerance."""
        cfg = HashGridConfig(num_levels=levels, level_dim=2,
                             base_resolution=16, log2_hashmap_size=log2,
                             desired_resolution=256, layout="corner",
                             coord_convention="ngp")
        offs = ref_offsets(levels, 2, 16, cfg.scale, log2)
        assert tuple(np.diff(offs)) == cfg.level_sizes  # schedule parity
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(int(offs[-1]), 2)).astype(np.float32)
        tables = [jnp.asarray(emb[offs[l]:offs[l + 1]]) for l in range(levels)]
        x = rng.uniform(-1, 1, size=(257, 3)).astype(np.float32)

        ours = np.asarray(hash_grid_encode(tables, jnp.asarray(x), cfg,
                                           bound=1.0))
        ref = ref_grid_encode_np((x + 1) / 2, emb, offs, 16, cfg.scale)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_vertex_and_ngp_differ(self):
        """The two conventions are genuinely different lattices (guards
        against the flag silently not being plumbed)."""
        kw = dict(num_levels=4, level_dim=2, base_resolution=16,
                  log2_hashmap_size=12, desired_resolution=128,
                  layout="corner")
        c_v = HashGridConfig(coord_convention="vertex", **kw)
        c_n = HashGridConfig(coord_convention="ngp", **kw)
        rng = np.random.default_rng(1)
        emb = [jnp.asarray(rng.normal(size=(s, 2)).astype(np.float32))
               for s in c_v.level_sizes]
        x = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)).astype(np.float32))
        a = np.asarray(hash_grid_encode(emb, x, c_v, bound=1.0))
        b = np.asarray(hash_grid_encode(emb, x, c_n, bound=1.0))
        assert not np.allclose(a, b)


def make_ref_state_dict(rng, levels=6, level_dim=2, log2=12, bound=1.0,
                        base=16, hidden=64, geo=15, with_grid=False,
                        grid_size=32):
    """Random reference-shaped state_dict (numpy values, torch key names)."""
    import math

    scale = 2.0 ** (math.log2(256 * bound / base) / (levels - 1))
    offs = ref_offsets(levels, level_dim, base, scale, log2)
    sd = {
        "encoder.embeddings": rng.normal(
            size=(int(offs[-1]), level_dim)).astype(np.float32) * 1e-1,
        "encoder.offsets": offs.astype(np.int32),
    }
    dims_s = [levels * level_dim, hidden, 1 + geo]
    for i in range(len(dims_s) - 1):
        sd[f"sigma_net.{i}.weight"] = rng.normal(
            size=(dims_s[i + 1], dims_s[i])).astype(np.float32) * 0.1
    dims_c = [16 + geo, hidden, hidden, 3]
    for i in range(len(dims_c) - 1):
        sd[f"color_net.{i}.weight"] = rng.normal(
            size=(dims_c[i + 1], dims_c[i])).astype(np.float32) * 0.1
    if with_grid:
        cas = 1 + int(np.ceil(np.log2(bound))) if bound > 1 else 1
        sd["density_grid"] = rng.uniform(
            0, 20, size=(cas, grid_size**3)).astype(np.float32)
    return sd, offs, scale


class TestImportStateDict:
    def test_full_model_parity(self):
        """Imported params + ngp config must reproduce the reference
        forward: sigma via the kernel-oracle encode -> bias-free ReLU MLP ->
        trunc_exp, color via SH + geo -> MLP -> sigmoid (network.py:95-122).
        The SH basis itself is shared with our encoder (its reference parity
        is pinned in test_encoders)."""
        from nerfnav_tpu.models import network as net
        from nerfnav_tpu.ops.spherical_harmonics import sh_encode
        from nerfnav_tpu.scripts.import_torch_ckpt import import_state_dict

        rng = np.random.default_rng(2)
        sd, offs, scale = make_ref_state_dict(rng)
        params, cfg, occ = import_state_dict(sd, bound=1.0,
                                             log2_hashmap_size=12,
                                             desired_resolution=256)
        assert occ is None
        assert cfg.grid_coord_convention == "ngp"

        x = rng.uniform(-1, 1, size=(97, 3)).astype(np.float32)
        d = rng.normal(size=(97, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        out = net.density(params, jnp.asarray(x), cfg)
        rgb = np.asarray(net.color(params, jnp.asarray(d),
                                   out["geo_feat"], cfg))
        sigma = np.asarray(out["sigma"])

        # oracle: reference forward in numpy
        h = ref_grid_encode_np((x + 1) / 2, sd["encoder.embeddings"],
                               offs, 16, scale)
        for i in range(2):
            h = h @ sd[f"sigma_net.{i}.weight"].T
            if i < 1:
                h = np.maximum(h, 0)
        sigma_ref = np.exp(np.clip(h[:, 0], -15, 15))
        geo_ref = h[:, 1:]
        hc = np.concatenate([np.asarray(sh_encode(jnp.asarray(d), degree=4)),
                             geo_ref], axis=-1)
        for i in range(3):
            hc = hc @ sd[f"color_net.{i}.weight"].T
            if i < 2:
                hc = np.maximum(hc, 0)
        rgb_ref = 1.0 / (1.0 + np.exp(-hc))

        np.testing.assert_allclose(sigma, sigma_ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-3, atol=1e-4)

    def test_density_grid_morton_decode(self):
        """density_grid rows are Morton-indexed in the reference; a high
        density planted at Morton(code of (x,y,z)) must land at our
        row-major (x*H + y)*H + z cell and mark its bitfield bit."""
        from nerfnav_tpu.ops.morton import morton3d
        from nerfnav_tpu.scripts.import_torch_ckpt import _import_density_grid

        gs = 32
        dens = np.zeros((1, gs**3), np.float32)
        xyz = (5, 17, 30)
        code = int(np.asarray(morton3d(jnp.asarray([xyz], jnp.uint32)))[0])
        dens[0, code] = 100.0
        state = _import_density_grid(dens, bound=1.0, grid_size=gs,
                                     density_thresh=10.0, mean_density=None)
        flat = (xyz[0] * gs + xyz[1]) * gs + xyz[2]
        assert state["density_grid"][0, flat] == 100.0
        assert (state["density_grid"][0] > 0).sum() == 1
        byte, bit = flat // 8, flat % 8
        assert (int(state["bitfield"][0, byte]) >> bit) & 1 == 1

    def test_torch_roundtrip_and_resume(self, tmp_path):
        """main(): torch.save -> import -> Trainer resumes the npz with the
        ngp convention and renders finite images."""
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(3)
        sd_np, _, _ = make_ref_state_dict(rng, with_grid=True, grid_size=32)
        sd_t = {k: torch.from_numpy(v) for k, v in sd_np.items()}
        pth = str(tmp_path / "ref.pth")
        torch.save({"model": sd_t, "epoch": 7, "global_step": 7000,
                    "mean_density": 3.3}, pth)

        from nerfnav_tpu.scripts.import_torch_ckpt import main as import_main

        out = str(tmp_path / "ckpts" / "ngp_ep0007.npz")
        import_main([pth, "--out", out, "--bound", "1.0",
                     "--log2_hashmap_size", "12", "--grid_size", "32",
                     "--desired_resolution", "256"])

        from nerfnav_tpu.models import NetworkConfig, RenderConfig
        from nerfnav_tpu.models.occupancy import OccupancyConfig
        from nerfnav_tpu.ops.marching import MarchConfig
        from nerfnav_tpu.training import Trainer, TrainerOptions

        cfg = NetworkConfig(bound=1.0, grid_levels=6, grid_level_dim=2,
                            grid_log2_hashmap_size=12, grid_layout="corner",
                            grid_coord_convention="ngp",
                            grid_max_resolution=256)
        rcfg = RenderConfig(num_steps=24, upsample_steps=0, min_near=0.05,
                            max_ray_batch=512)
        opt = TrainerOptions(name="imp", workspace=str(tmp_path / "ws"),
                             use_checkpoint=out, num_rays=64)
        tr = Trainer(cfg, rcfg, opt,
                     occupancy_cfg=OccupancyConfig(bound=1.0, grid_size=32),
                     march_cfg=MarchConfig(bound=1.0, grid_size=32,
                                           max_steps=64, samples_per_ray=8,
                                           min_near=0.05))
        tr.state = tr._init_state(1)
        tr._maybe_resume()
        assert tr.epoch == 7
        # imported tables actually landed (not the random template)
        np.testing.assert_allclose(
            np.asarray(tr.state.params["encoder"][0]),
            sd_np["encoder.embeddings"][:int(
                np.diff(sd_np["encoder.offsets"])[0])])
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -1.5
        img, _ = tr.render_full(tr.state.ema_params, pose,
                                np.asarray([32.0, 32.0, 16.0, 16.0]), 32, 32)
        assert np.all(np.isfinite(np.asarray(img)))

    def test_export_roundtrip(self, tmp_path):
        """torch -> import -> export -> torch must reproduce every tensor
        (incl. the Morton-indexed density grid)."""
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(5)
        sd_np, _, _ = make_ref_state_dict(rng, with_grid=True, grid_size=32)
        # the density EMA in _finish_update leaves values intact only where
        # grid >= 0; imported grids pass through exactly
        pth = str(tmp_path / "ref.pth")
        torch.save({"model": {k: torch.from_numpy(v)
                              for k, v in sd_np.items()}}, pth)

        from nerfnav_tpu.scripts.export_torch_ckpt import main as export_main
        from nerfnav_tpu.scripts.import_torch_ckpt import main as import_main

        mid = str(tmp_path / "ngp_ep0001.npz")
        import_main([pth, "--out", mid, "--bound", "1.0",
                     "--log2_hashmap_size", "12", "--grid_size", "32",
                     "--desired_resolution", "256"])
        out = str(tmp_path / "back.pth")
        export_main([mid, "--out", out, "--grid_size", "32"])

        back = {k: v.numpy() for k, v in
                torch.load(out, weights_only=False)["model"].items()}
        for k, v in sd_np.items():
            if k == "encoder.offsets":
                np.testing.assert_array_equal(back[k], v)
            elif k == "density_grid":
                np.testing.assert_allclose(back[k], v, rtol=1e-6)
            else:
                np.testing.assert_allclose(back[k], v, rtol=1e-6, err_msg=k)

    def test_grid_meta_mismatch_fails_loudly(self, tmp_path):
        """Loading an imported (ngp) checkpoint under the native vertex
        convention must raise, not render garbage."""
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(4)
        sd_np, _, _ = make_ref_state_dict(rng)
        sd_t = {k: torch.from_numpy(v) for k, v in sd_np.items()}
        pth = str(tmp_path / "ref.pth")
        torch.save({"model": sd_t}, pth)

        from nerfnav_tpu.scripts.import_torch_ckpt import main as import_main

        out = str(tmp_path / "ngp_ep0001.npz")
        import_main([pth, "--out", out, "--bound", "1.0",
                     "--log2_hashmap_size", "12",
                     "--desired_resolution", "256"])

        from nerfnav_tpu.models import NetworkConfig, RenderConfig
        from nerfnav_tpu.training import Trainer, TrainerOptions

        cfg = NetworkConfig(bound=1.0, grid_levels=6, grid_level_dim=2,
                            grid_log2_hashmap_size=12, grid_layout="corner",
                            grid_max_resolution=256)  # vertex convention
        opt = TrainerOptions(name="imp", workspace=str(tmp_path / "ws2"),
                             use_checkpoint=out, num_rays=64)
        tr = Trainer(cfg, RenderConfig(num_steps=8, upsample_steps=0), opt)
        tr.state = tr._init_state(1)
        with pytest.raises(ValueError, match="grid architecture"):
            tr._maybe_resume()
