"""Are the XLA-built uint8 tap planes correct on TPU?"""
import jax, jax.numpy as jnp, numpy as np

H, W = 128, 256
OH, OW = H // 2, W // 2

def planes_strided(images):  # what fused_stem_nchw does
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    return jnp.stack([padded[:, dy:dy + 2 * OH:2, dx:dx + 2 * OW:2]
                      for dy in range(3) for dx in range(3)], axis=1)

def planes_reshape(images):  # round-1 style reshape phase split
    padded = jnp.pad(images, ((0, 0), (1, 3), (1, 3)))  # (H+4, W+4) even
    ph = padded.reshape(images.shape[0], OH + 2, 2, OW + 2, 2)
    outs = []
    for dy in range(3):
        a, i0 = dy % 2, dy // 2
        for dx in range(3):
            b_, j0 = dx % 2, dx // 2
            outs.append(ph[:, i0:i0 + OH, a, j0:j0 + OW, b_])
    return jnp.stack(outs, axis=1)

def planes_np(images):
    padded = np.pad(np.asarray(images), ((0, 0), (1, 1), (1, 1)))
    return np.stack([padded[:, dy:dy + 2 * OH:2, dx:dx + 2 * OW:2]
                     for dy in range(3) for dx in range(3)], axis=1)

def main():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, H, W), np.uint8)
    want = planes_np(imgs)
    for name, fn in [("strided u8", planes_strided),
                     ("reshape u8", planes_reshape),
                     ("strided i32", lambda x: planes_strided(x.astype(jnp.int32)).astype(jnp.uint8))]:
        got = np.asarray(jax.jit(fn)(jnp.asarray(imgs)))
        print(f"{name}: shape={got.shape} mismatches={int((got != want).sum())} / {want.size}")

if __name__ == "__main__":
    main()
