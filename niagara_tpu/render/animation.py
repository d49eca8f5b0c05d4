"""Animation playback: resampled keyframe tracks applied to draws each frame.

Reference: animations are linear TRS tracks resampled at a fixed period at
load (scene.cpp:707-834) and played back per frame by lerp/slerp into the
draw buffer (niagara.cpp:1362-1411).  Here playback is a vectorized jnp
update over all animated draws — it runs inside the jitted frame step, so
animating N draws costs one fused kernel (and removes the reference's
acknowledged host/GPU write race, niagara.cpp:1361).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class AnimationTable:
    """SoA animation tracks (reference Animation/Keyframe, scene.h:119-136)."""

    draw_index: Any  # i32 [A] (-1 = none)
    light_index: Any  # i32 [A] (-1 = none)
    start_time: Any  # f32 [A]
    period: Any  # f32 [A]
    key_offset: Any  # i32 [A]
    key_count: Any  # i32 [A]
    key_translation: Any  # f32 [K,3]
    key_scale: Any  # f32 [K]
    key_rotation: Any  # f32 [K,4] xyzw

    @staticmethod
    def empty():
        return AnimationTable(
            draw_index=np.zeros(0, np.int32),
            light_index=np.zeros(0, np.int32),
            start_time=np.zeros(0, np.float32),
            period=np.ones(0, np.float32),
            key_offset=np.zeros(0, np.int32),
            key_count=np.zeros(0, np.int32),
            key_translation=np.zeros((0, 3), np.float32),
            key_scale=np.zeros(0, np.float32),
            key_rotation=np.zeros((0, 4), np.float32),
        )


def _slerp(q0, q1, t):
    """Quaternion slerp with shortest-path handling (glm::slerp semantics)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)

    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-4

    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(n, 1e-20)


def evaluate(anim: AnimationTable, time):
    """Sample all tracks at `time`.

    Returns (draw_index [A], position [A,3], scale [A], orientation [A,4],
    active [A]) — apply with apply_to_draws.
    """
    index = (time - anim.start_time) / anim.period
    active = index >= 0
    count = jnp.maximum(anim.key_count, 1).astype(jnp.float32)
    index = jnp.mod(index, count)

    i0 = index.astype(jnp.int32) % jnp.maximum(anim.key_count, 1)
    i1 = (i0 + 1) % jnp.maximum(anim.key_count, 1)
    t = (index - jnp.floor(index))[:, None]

    k0 = anim.key_offset + i0
    k1 = anim.key_offset + i1

    position = anim.key_translation[k0] * (1 - t) + anim.key_translation[k1] * t
    scale = anim.key_scale[k0] * (1 - t[:, 0]) + anim.key_scale[k1] * t[:, 0]
    orientation = _slerp(anim.key_rotation[k0], anim.key_rotation[k1], t)
    return anim.draw_index, position, scale, orientation, active


def apply_to_draws(scene, anim: AnimationTable, time):
    """Return a copy of `scene` with animated draw transforms at `time`
    scattered in (draws without animation are untouched)."""
    if anim.draw_index.shape[0] == 0:
        return scene

    draw_index, position, scale, orientation, active = evaluate(anim, time)
    target = jnp.where(active & (draw_index >= 0), draw_index, scene.draw_scale.shape[0])

    import dataclasses

    xform = jnp.concatenate([position, scale[:, None], orientation], axis=-1)
    return dataclasses.replace(
        scene,
        draw_position=jnp.asarray(scene.draw_position).at[target].set(position, mode="drop"),
        draw_scale=jnp.asarray(scene.draw_scale).at[target].set(scale, mode="drop"),
        draw_orientation=jnp.asarray(scene.draw_orientation).at[target].set(orientation, mode="drop"),
        # keep the baked transform rows (the hot-path copy) in sync
        draw_xform_row=jnp.asarray(scene.draw_xform_row).at[target].set(xform, mode="drop"),
    )
