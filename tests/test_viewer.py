"""Viewer / progressive-runtime units: the ANSI frame encoder and the
pipelined pump's stale-epoch rule (the reference's worker-side epoch
filtering, worker.rs:58-66, narrowed to the one in-flight wave)."""

import numpy as np

from paths_tpu.viewer import _frame_to_ansi


def _naive_ansi(rgb_bytes):
    """The original per-cell f-string encoder, kept as the reference."""
    h, w, _ = rgb_bytes.shape
    if h % 2:
        rgb_bytes = rgb_bytes[:-1]
        h -= 1
    top = rgb_bytes[0::2]
    bot = rgb_bytes[1::2]
    lines = []
    for y in range(h // 2):
        row = []
        for x in range(w):
            tr, tg, tb = top[y, x]
            br, bg, bb = bot[y, x]
            row.append(
                f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀")
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def test_frame_to_ansi_matches_naive():
    rng = np.random.default_rng(0)
    for h, w in [(8, 5), (7, 3), (2, 1), (10, 16)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        # Exercise the digit-count edge values.
        img.reshape(-1)[:: 7] = 0
        img.reshape(-1)[1:: 11] = 255
        assert _frame_to_ansi(img) == _naive_ansi(img), (h, w)


def test_pipelined_pump_drops_stale_epoch():
    """A camera move while a wave is in flight must drop that wave: the
    estimator may only contain post-reset samples."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import numpy as np

    from paths_tpu import camera as C
    from paths_tpu.progressive import ProgressiveRenderer
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.stress import generate_stress_scene

    sd = generate_stress_scene(4, seed=0)
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(static, max_bounces=2)
    W, H = 24, 12
    cam = C.resize(cam, W, H)
    r = ProgressiveRenderer(static, scene, cam, W, H)

    r.pump()  # dispatch preview wave (nothing accumulated yet: pipelined)
    assert r.estimator.count.sum() == 0
    # Camera move invalidates the in-flight wave.
    rot = np.asarray(cam.rot)
    r.set_camera(np.asarray(cam.location) + [0.1, 0, 0], rot)
    epoch_after_move = r.epoch
    r.pump()  # stale wave arrives and is dropped; new preview dispatched
    assert r.estimator.count.sum() == 0, "stale-epoch wave leaked"
    r.pump()  # the post-move preview lands
    n_preview = len(r._prev_idx)
    assert r.estimator.count.sum() == n_preview
    assert r.epoch == epoch_after_move
    r.pump()  # full wave of the new epoch lands
    assert r.estimator.count.sum() == n_preview + W * H
    assert np.isfinite(r.frame()).all()
