"""Engine-wide compile-time configuration.

Single source of truth shared by the C++ cooker, the JAX/Pallas kernels and the
frame orchestrator — the TPU analog of the reference's src/config.h (which is
#included by both C++ and GLSL).

Values that mirror the reference keep the reference names; TPU-only tuning
values are grouped at the bottom.
"""

# --- Meshlet geometry budget (reference: config.h:14-15) ---
MESH_MAXVTX = 64  # max vertices per meshlet
MESH_MAXTRI = 96  # max triangles per meshlet

# Meshlet build configuration (reference: config.h:18-19)
MESHLET_CONE_WEIGHT = 0.25
MESHLET_FILL_WEIGHT = 0.5

# Task/cluster workgroup sizing (reference: config.h:2-5).  On TPU there are no
# workgroups, but the drawcull kernel still splits each draw's meshlet range
# into TASK_WGSIZE-sized "task commands" so that per-meshlet work is expressed
# over fixed-shape [num_commands, TASK_WGSIZE] arrays.
TASK_WGSIZE = 64

# Capacity limits -> static shapes for XLA (reference: config.h:24-28).
# The reference drops draws/clusters on overflow (drawcull.comp.glsl:128-139);
# we reproduce that as masked writes past per-frame capacities, which are
# runtime-sized in render.frame.FrameConfig (cmd_capacity / cluster_capacity /
# tri_capacity) rather than fixed here: XLA static shapes make capacity a
# memory/time trade-off per scene, not a global compile-time ceiling.

# Number of LOD slots per mesh.  The reference stops at 8 (scene.h:92
# "MeshLod lods[8]"); we extend to 16 because software rasterization makes
# distant-draw triangle counts precious — the deeper chain lets a far-away
# mesh collapse to a single meshlet.
MAX_LODS = 16

# --- TPU-specific tuning ---

# Framebuffer tile processed by one Pallas rasterizer grid step, in pixels
# (rows, cols): one (8,128) VPU vreg — ops/raster_tile.py imports these.
TILE_H = 8
TILE_W = 128

# Default render resolution (the reference is windowed; benchmarks use 1080p).
RENDER_WIDTH = 1920
RENDER_HEIGHT = 1080

# Depth convention: reverse-Z, infinite far plane (reference niagara.cpp:424-432,
# shaders.cpp:699 VK_COMPARE_OP_GREATER).  Depth clear value is 0.0.
DEPTH_CLEAR = 0.0
