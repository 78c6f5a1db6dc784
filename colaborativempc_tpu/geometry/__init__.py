from colaborativempc_tpu.geometry.tracks import Track, make_track, TRACK_NAMES
from colaborativempc_tpu.geometry.frenet import (
    wrap_s, check_lap, segment_index, curvature, halfwidth,
    frenet_to_cartesian, cartesian_to_frenet, check_lane, check_end,
    relocalize, select_lane,
    wrap_to_pi,
)
from colaborativempc_tpu.geometry.planes import (
    compute_hyperplanes, plane_signed_distance, separation_weights,
)
from colaborativempc_tpu.geometry.spline import (
    fit_centerline, track_from_json, load_track_json, project_on_spline,
    remove_outliers, halfwidth_from_boundaries,
)
