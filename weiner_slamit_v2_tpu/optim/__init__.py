from . import ba_extract, local_ba, pnp, pose_graph, pose_opt, sim3_solver  # noqa: F401
