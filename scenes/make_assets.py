"""Generate the procedural assets used by the bundled demo scenes.

The reference's environment.yml points at HDRIs/meshes it does not bundle
(/root/reference/scenes/environment.yml:13-14), so the demo scenes here use
reproducible procedural stand-ins.

NB the renderer evaluates the skybox at the *negated* ray direction
(trace.rs:21: ambient_light(ray.direction * -1)), so a map authored
"physically" (ground in the low-latitude rows) must be flipped vertically
and the sun azimuth shifted by half the width to appear where intended.
This generator bakes that flip in.

Usage: python scenes/make_assets.py
"""

import os

import numpy as np


def make_sunrise(h=128, w=256):
    lat = np.pi * (1.0 - (np.arange(h)[:, None] + 0.5) / h)
    cos_up = np.cos(lat)  # -1 at row 0 .. +1 at row h-1 (map convention)
    sky_t = np.clip((cos_up + 1) / 2, 0, 1)
    horizon = np.array([1.0, 0.45, 0.2])
    zenith = np.array([0.15, 0.35, 0.8])
    ground = np.array([0.08, 0.07, 0.06])
    img = np.where(
        cos_up[..., None] > 0,
        horizon * (1 - sky_t[..., None]) * 2 + zenith * sky_t[..., None],
        ground * (0.3 + 0.7 * (1 + cos_up[..., None])),
    )
    img = np.broadcast_to(img, (h, w, 3)).copy()
    # Flip so rays pointing up (looked up at -d) see the sky half, and place
    # the sun where a camera looking +z sees it slightly right of centre.
    img = img[::-1].copy()
    sun_y, sun_x = int(h * 0.42), int(w * 0.30)
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = ((yy - sun_y) / 2.0) ** 2 + ((xx - sun_x) / 2.0) ** 2
    img[d2 < 4] = [800.0, 700.0, 500.0]
    img[(d2 >= 4) & (d2 < 16)] += np.array([20.0, 12.0, 5.0])
    return img.astype(np.float32)


def main():
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    from paths_tpu.scene.hdr_loader import write_hdr
    out = os.path.join(here, "assets", "sunrise.hdr")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_hdr(out, make_sunrise())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
