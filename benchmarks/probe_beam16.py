from nerfnav_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, dataclasses
# chip probe (use JAX_PLATFORMS=cpu to force CPU)
import jax.numpy as jnp
from nerfnav_tpu.data.rays import get_all_rays, tile_order
from nerfnav_tpu.ops.marching import MarchConfig, march, plan_occupied_ladder
from nerfnav_tpu.ops.morton import pack_blocks, packbits

BOUND, Hg, f, H, W = 2.0, 128, 4, 800, 800
hc = Hg // f
idx = np.arange(Hg**3)
c = (np.stack([idx // (Hg*Hg), (idx // Hg) % Hg, idx % Hg], -1) + 0.5) / Hg * 2 - 1
r = np.linalg.norm(c, axis=-1)
occ0 = ((r > 0.35) & (r < 0.5)) | (np.abs(c[:, 2] + 0.8) < 0.05)
occs = [occ0, (r < 0.3)]
coarse_list = [o.reshape(hc, f, hc, f, hc, f).max(axis=(1,3,5)).reshape(-1) for o in occs]
occupancy = {
    "bitfield": jnp.stack([packbits(jnp.asarray(o.astype(np.float32))) for o in occs]),
    "bitfield_coarse": jnp.stack([packbits(jnp.asarray(o.astype(np.float32))) for o in coarse_list]),
    "blocks": pack_blocks(jnp.asarray(np.stack(occs)), Hg),
    "blocks_coarse": pack_blocks(jnp.asarray(np.stack(coarse_list)), hc, block=8),
}
m0 = MarchConfig(bound=BOUND, grid_size=128, max_steps=1024, samples_per_ray=32,
                 min_near=0.2, coarse_normalized=True, coarse_segments=12, coarse_anchors=2)
m0 = dataclasses.replace(m0, t_a0_steps=plan_occupied_ladder(np.stack(occs), m0))
intr = jnp.asarray([1000.0, 1000.0, W/2, H/2], jnp.float32)
pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -1.8]))
rays = get_all_rays(pose, intr, H, W)
perm, _ = tile_order(H, W, 64)
ro = jnp.asarray(np.asarray(rays["rays_o"])[perm])
rd = jnp.asarray(np.asarray(rays["rays_d"])[perm])
chunk = 4096
pad = (-H*W) % chunk
ro = jnp.concatenate([ro, jnp.zeros((pad,3))]); rd = jnp.concatenate([rd, jnp.ones((pad,3))])
f1 = jax.jit(lambda a,b: march(a,b,occupancy,dataclasses.replace(m0,beam=1))["valid"].sum(1))
f16 = jax.jit(lambda a,b: march(a,b,occupancy,dataclasses.replace(m0,beam=16))["valid"].sum(1))
tot1 = tot16 = 0
worst = []
for i in range(0, H*W+pad, chunk):
    v1 = int(f1(ro[i:i+chunk], rd[i:i+chunk]).sum())
    v16 = int(f16(ro[i:i+chunk], rd[i:i+chunk]).sum())
    tot1 += v1; tot16 += v16
    if v1 > 0 and v16 < 0.5 * v1:
        worst.append((i//chunk, v1, v16))
print("total beam1:", tot1, "beam16:", tot16)
print("chunks with >50% loss:", worst[:20], "…" if len(worst)>20 else "")
