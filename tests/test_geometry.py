"""Geometry core tests: track tables, Frenet transforms, hyperplanes.

Validation strategy mirrors SURVEY.md §4: analytic identities (round trips,
known track shapes) instead of the reference's assert-by-eyeball scripts
(test_planes.py, show_maps.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colaborativempc_tpu.geometry import (
    TRACK_NAMES, make_track, wrap_s, curvature, halfwidth,
    frenet_to_cartesian, cartesian_to_frenet, check_lane,
    compute_hyperplanes, plane_signed_distance, separation_weights,
)


@pytest.fixture(scope="module")
def oval():
    return make_track("oval")


def test_all_tracks_build():
    for name in TRACK_NAMES:
        t = make_track(name)
        assert np.all(np.asarray(t.track_length) > 0)
        assert np.all(np.asarray(t.length) >= 0)


def test_closed_track_closes():
    """End of the last segment must land on the start point for closed tracks."""
    for name in TRACK_NAMES:
        t = make_track(name, dtype=jnp.float64 if jax.config.jax_enable_x64
                       else jnp.float32)
        if bool(t.open_flag):
            continue
        for lane in range(t.n_lanes):
            L = float(t.track_length[lane])
            x, y, _ = frenet_to_cartesian(t, jnp.asarray(L - 1e-6), 0.0, lane)
            x0, y0, _ = frenet_to_cartesian(t, jnp.asarray(0.0), 0.0, lane)
            assert abs(float(x) - float(x0)) < 2e-3, name
            assert abs(float(y) - float(y0)) < 2e-3, name


def test_oval_geometry_analytic(oval):
    """The oval is 2 straights (2.0, 4.0) + 2 half-circle arcs of length 5.85."""
    r = 5.85 / np.pi
    # start of track: (0, 2*hw) facing +x
    x, y, th = frenet_to_cartesian(oval, 0.0, 0.0)
    assert np.isclose(float(x), 0.0, atol=1e-5)
    assert np.isclose(float(y), 1.1, atol=1e-5)
    assert np.isclose(float(th), 0.0, atol=1e-6)
    # end of first straight
    x, y, th = frenet_to_cartesian(oval, 2.0 - 1e-6, 0.0)
    assert np.isclose(float(x), 2.0, atol=1e-4)
    # halfway through first arc: quarter circle, heading pi/2
    x, y, th = frenet_to_cartesian(oval, 2.0 + 5.85 / 2, 0.0)
    assert np.isclose(float(th), np.pi / 2, atol=1e-5)
    assert np.isclose(float(x), 2.0 + r, atol=1e-4)
    assert np.isclose(float(y), 1.1 + r, atol=1e-4)
    # after the full arc, heading pi (returning)
    x, y, th = frenet_to_cartesian(oval, 2.0 + 5.85 + 0.5, 0.0)
    assert np.isclose(abs(float(th)) % (2 * np.pi), np.pi, atol=1e-5)


def test_ey_offset_direction(oval):
    """Positive ey must be the left normal of the tangent."""
    for s in [0.5, 3.0, 6.0, 9.0]:
        x0, y0, th = frenet_to_cartesian(oval, s, 0.0)
        x1, y1, _ = frenet_to_cartesian(oval, s, 0.3)
        dx, dy = float(x1 - x0), float(y1 - y0)
        nx, ny = -np.sin(float(th)), np.cos(float(th))
        assert np.isclose(dx, 0.3 * nx, atol=1e-5)
        assert np.isclose(dy, 0.3 * ny, atol=1e-5)


def test_roundtrip_frenet_cartesian():
    """frenet -> cartesian -> frenet is identity inside the track band."""
    for name in ["oval", "Highway", "L_shape", "SL"]:
        t = make_track(name)
        L = float(t.track_length[0])
        rng = np.random.default_rng(0)
        ss = rng.uniform(0.05, L - 0.05, size=32)
        eys = rng.uniform(-0.3, 0.3, size=32)
        x, y, th = frenet_to_cartesian(t, jnp.asarray(ss), jnp.asarray(eys))
        f = jax.vmap(lambda xi, yi, ti: cartesian_to_frenet(t, xi, yi, ti))
        s2, ey2, epsi2, ok = f(x, y, th)
        ok = np.asarray(ok)
        assert ok.all(), name
        assert np.allclose(np.asarray(s2), ss, atol=5e-3), name
        assert np.allclose(np.asarray(ey2), eys, atol=5e-3), name
        assert np.allclose(np.asarray(epsi2), 0.0, atol=5e-3), name


def test_wrap_s(oval):
    L = float(oval.track_length[0])
    assert np.isclose(float(wrap_s(oval, L + 1.0)), 1.0, atol=1e-5)
    assert float(wrap_s(oval, -0.5)) == 0.0
    hw = make_track("Highway")
    Lh = float(hw.track_length[0])
    assert np.isclose(float(wrap_s(hw, Lh + 1.0)), 1.0, atol=1e-4)
    # open track: values below length unchanged
    assert np.isclose(float(wrap_s(hw, Lh - 1.0)), Lh - 1.0, atol=1e-4)


def test_curvature_and_halfwidth(oval):
    assert float(curvature(oval, 0.5)) == 0.0
    assert np.isclose(float(curvature(oval, 3.0)), np.pi / 5.85, rtol=1e-5)
    assert np.isclose(float(halfwidth(oval, 0.5)), 0.55, atol=1e-6)
    sl = make_track("SL")
    assert np.isclose(float(halfwidth(sl, 0.5)), 0.75, atol=1e-6)
    assert np.isclose(float(halfwidth(sl, 6.5)), 0.65, atol=1e-6)
    assert np.isclose(float(halfwidth(sl, 13.0, sm=0.9)), 0.35 * 0.9, atol=1e-6)


def test_multilane():
    t = make_track("Oval2")
    assert t.n_lanes == 2
    s, ey, epsi, ok, lane = check_lane(t, 0.1, 2.0, 0.0)
    assert bool(ok)
    # y=2.0 is lane 1's centerline (y_ini = 2*2*0.5)
    assert int(lane) == 1


def test_hyperplanes_separate():
    rng = np.random.default_rng(1)
    H, n = 5, 3
    ego = jnp.asarray(rng.normal(size=(H, 2)))
    neigh = jnp.asarray(ego[:, None, :] + rng.normal(size=(H, n, 2)) + 3.0)
    planes = compute_hyperplanes(ego, neigh, keep_sign=True)
    # unit normals
    assert np.allclose(np.asarray(jnp.linalg.norm(planes[..., :2], axis=-1)),
                       1.0, atol=1e-5)
    d_ego = plane_signed_distance(planes, ego[:, None, :])
    d_ngh = plane_signed_distance(planes, neigh)
    # ego strictly on negative side, neighbour positive, symmetric
    assert np.all(np.asarray(d_ego) < 0)
    assert np.all(np.asarray(d_ngh) > 0)
    assert np.allclose(np.asarray(d_ego), -np.asarray(d_ngh), atol=1e-5)


def test_hyperplane_sign_convention():
    ego = jnp.zeros((2, 2))
    neigh = jnp.ones((2, 1, 2))
    p_master = compute_hyperplanes(ego, neigh, ego_id=0, neigh_ids=jnp.array([1]))
    p_slave = compute_hyperplanes(ego, neigh, ego_id=1, neigh_ids=jnp.array([0]))
    assert np.allclose(np.asarray(p_master), -np.asarray(p_slave), atol=1e-6)


def test_separation_weights():
    ego = jnp.zeros((4, 2))
    neigh = jnp.ones((4, 2, 2))  # dist sqrt(2)
    w, d = separation_weights(ego, neigh, min_dist=0.25)
    assert np.allclose(np.asarray(d), np.sqrt(2), atol=1e-5)
    assert np.allclose(np.asarray(w), (0.5 - np.sqrt(2)) / 2, atol=1e-5)


def test_segment_boundaries_exact():
    """Lookups exactly at segment joints pick the downstream segment."""
    from colaborativempc_tpu.geometry import segment_index
    t = make_track("oval")
    # oval s0 = [0, 2.0, 7.85, 11.85, 17.7] + closing
    idx, sw = segment_index(t, 2.0)
    assert int(idx) == 1 and abs(float(sw) - 2.0) < 1e-6
    idx, _ = segment_index(t, 1.999)
    assert int(idx) == 0


def test_check_lap_counts():
    from colaborativempc_tpu.geometry import check_lap
    t = make_track("oval")
    L = float(t.track_length[0])
    assert int(check_lap(t, 0.5 * L)) == 0
    assert int(check_lap(t, 1.5 * L)) == 1
    assert int(check_lap(t, 2.5 * L)) == 2


def test_relocalize_preserves_lap_count():
    """relocalize keeps the lap multiple closest to the old s (the Frenet s
    is cumulative across laps; the lane-local localisation is not)."""
    import jax.numpy as jnp
    from colaborativempc_tpu.geometry import (
        make_track, frenet_to_cartesian, relocalize, select_lane,
    )

    track = make_track("oval")
    L = float(track.track_length[0])
    s_local = 1.3
    x, y, th = frenet_to_cartesian(track, s_local, 0.05)
    for laps in (0, 1, 3):
        s_old = laps * L + s_local
        state = jnp.asarray([1.0, 0, 0, 0.0, 0.0, float(th),
                             s_old, float(x), float(y)], jnp.float32)
        out = relocalize(track, state, 0)
        assert abs(float(out[6]) - s_old) < 1e-2, (laps, float(out[6]))
        assert abs(float(out[3]) - 0.05) < 1e-3
        lane, out2 = select_lane(track, state)
        assert int(lane) == 0
        assert abs(float(out2[6]) - s_old) < 1e-2


def test_relocalize_cross_lane_lap_count():
    """Switching to a lane of DIFFERENT length after several laps keeps the
    completed-lap count: k is derived against the OLD lane's length with the
    new lane's fractional progress rescaled proportionally (rounding against
    the new length alone drifts by laps*|L0-L1| and lands on the wrong lap
    once that exceeds L1/2)."""
    import jax.numpy as jnp
    from colaborativempc_tpu.geometry import (
        make_track, frenet_to_cartesian, relocalize, select_lane,
    )

    track = make_track("Oval2")           # lanes of length 26.0 and 19.7
    L0 = float(track.track_length[0])
    L1 = float(track.track_length[1])
    assert abs(L0 - L1) > 1.0
    laps = 5                              # laps*|L0-L1| = 31.5 >> L1/2
    frac = 0.12                           # fractional progress around the lap
    x, y, th = frenet_to_cartesian(track, frac * L1, 0.0, lane=1)
    s_old = laps * L0 + frac * L0         # measured on lane 0
    state = jnp.asarray([1.0, 0, 0, 0, 0, float(th),
                         s_old, float(x), float(y)], jnp.float32)
    out = relocalize(track, state, 1, old_lane=0)
    want = laps * L1 + frac * L1
    assert abs(float(out[6]) - want) < 0.35 * L1, (float(out[6]), want)
    assert round(float(out[6]) // L1) == laps
    # select_lane with prev_lane threads the same bookkeeping
    lane, out2 = select_lane(track, state, prev_lane=0)
    if int(lane) == 1:
        assert round(float(out2[6]) // L1) == laps
