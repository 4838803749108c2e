"""Blender (bpy) script: cut an object into 4 slabs per axis and render.

Run by gen_slices.py.  Behavior of the reference slicer
(render_slices/blender_script_slices.py):

* re-apply the normalization recorded in meta.pkl (scale + offset) so the
  slices line up with the input views (reference normalize_scene :363-394);
* per view: in 'camera' mode transform a duplicated mesh's vertices by the
  camera's inverse world matrix so slabs are camera-aligned (reference
  :262-272); in 'axis' mode keep canonical axes;
* per axis (X, Y, Z): compute the mesh extent, cut 4 equal slabs with
  bisect clipping; the slab-coordinate order is REVERSED for Y and Z
  (reference :291-295), so X_1 is the min-X slab while Y_1/Z_1 sit at the
  axis maximum — the dataset reader's X1-4 / Z4-1 / Y1-4 sequence
  (reg_slices/src/datasets.py:106-120) depends on exactly this layout;
* render each slab alone (other objects hidden) with the camera reset to
  the origin looking down -Z at the old origin's depth (reference
  reset_camera :345-361);
* write ``<view>/{axis}_{slab}.png``.

All pure math lives in :mod:`slicing_math` (numpy, no bpy) and is
unit-tested in tests/test_slicing_math.py; this file only drives bpy.
"""

import argparse
import os
import pickle
import sys

import bpy
import numpy as np
from mathutils import Matrix, Vector

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from slicing_math import (  # noqa: E402
    camera_world_matrix,
    reset_camera_target_z,
    slab_coords,
    slab_interval,
)


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--object_path", type=str, required=True)
    p.add_argument("--meta_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--n_views", type=int, default=12)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--slice_direction", type=str, default="camera")
    return p.parse_args(argv)


def reset_scene():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()


def scene_meshes():
    return [o for o in bpy.context.scene.objects if o.type == "MESH"]


def join_meshes():
    meshes = scene_meshes()
    if len(meshes) > 1:
        bpy.ops.object.select_all(action="DESELECT")
        for m in meshes:
            m.select_set(True)
        bpy.context.view_layer.objects.active = meshes[0]
        bpy.ops.object.join()
    return scene_meshes()[0]


def apply_normalization(obj, scale, offset):
    obj.scale = obj.scale * scale
    bpy.context.view_layer.update()
    obj.matrix_world.translation += Vector(offset)
    bpy.ops.object.select_all(action="DESELECT")
    obj.select_set(True)
    bpy.context.view_layer.objects.active = obj
    bpy.ops.object.transform_apply(location=True, rotation=True, scale=True)


def make_camera():
    cam_data = bpy.data.cameras.new("cam")
    cam_data.lens = 35.0
    cam_data.sensor_width = 32.0
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    return cam


def set_camera_reset_pose(cam, dist):
    """Slab-render pose (reference reset_camera): the mesh already lives in
    camera coordinates, so the camera sits at the origin looking down -Z
    toward the old origin's depth."""
    cam.location = (0.0, 0.0, 0.0)
    cam.rotation_euler = (0.0, 0.0, 0.0)  # Blender camera looks down -Z
    # the tracked target is (0, 0, z0) with z0 = -dist; looking down -Z
    # from the origin already points at it — no extra rotation needed
    assert reset_camera_target_z(dist) < 0


def duplicate_in_camera_frame(obj, az, el, dist):
    """Copy of obj with vertices mapped by the camera's inverse world
    matrix (reference blender_script_slices.py:262-272)."""
    dup = obj.copy()
    dup.data = obj.data.copy()
    bpy.context.scene.collection.objects.link(dup)
    m_inv = np.linalg.inv(camera_world_matrix(az, el, dist))
    dup.data.transform(Matrix(m_inv.tolist()))
    dup.data.update()
    return dup


def slab_copy(obj, axis_idx, lo, hi):
    """Copy of obj clipped to lo <= axis < hi via two bisect cuts."""
    dup = obj.copy()
    dup.data = obj.data.copy()
    bpy.context.scene.collection.objects.link(dup)
    bpy.ops.object.select_all(action="DESELECT")
    dup.select_set(True)
    bpy.context.view_layer.objects.active = dup
    normal = [0.0, 0.0, 0.0]
    normal[axis_idx] = 1.0
    for plane_co, clip_inner in ((lo, False), (hi, True)):
        co = [0.0, 0.0, 0.0]
        co[axis_idx] = plane_co
        bpy.ops.object.mode_set(mode="EDIT")
        bpy.ops.mesh.select_all(action="SELECT")
        bpy.ops.mesh.bisect(
            plane_co=co, plane_no=normal,
            clear_inner=clip_inner, clear_outer=not clip_inner,
        )
        bpy.ops.object.mode_set(mode="OBJECT")
    return dup


def main():
    args = parse_args()
    with open(args.meta_path, "rb") as f:
        meta = pickle.load(f)
    azimuths, elevations, distances = meta[1], meta[2], meta[3]
    scale, offset = meta[5], meta[6]

    reset_scene()
    bpy.ops.import_scene.gltf(filepath=args.object_path)
    base = join_meshes()
    apply_normalization(base, scale, offset)

    scene = bpy.context.scene
    scene.render.film_transparent = True
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.image_settings.color_mode = "RGBA"
    light_data = bpy.data.lights.new("sun", type="SUN")
    light = bpy.data.objects.new("sun", light_data)
    scene.collection.objects.link(light)

    cam = make_camera()

    n_slabs = 4
    for v in range(args.n_views):
        view_dir = os.path.join(args.output_dir, "%03d" % v)
        os.makedirs(view_dir, exist_ok=True)
        az, el, dist = float(azimuths[v]), float(elevations[v]), float(distances[v])
        if args.slice_direction == "camera":
            mesh = duplicate_in_camera_frame(base, az, el, dist)
            set_camera_reset_pose(cam, dist)
        else:
            mesh = base
            m = camera_world_matrix(az, el, dist)
            cam.matrix_world = Matrix(m.tolist())
        coords_np = np.array([tuple(vv.co) for vv in mesh.data.vertices])
        base.hide_render = True
        for name, axis_idx in (("X", 0), ("Y", 1), ("Z", 2)):
            lo_ext = float(coords_np[:, axis_idx].min()) - 1e-5
            hi_ext = float(coords_np[:, axis_idx].max()) + 1e-5
            coords = slab_coords(lo_ext, hi_ext, n_slabs, name)
            for k in range(1, n_slabs + 1):
                lo, hi = slab_interval(coords, k)
                slab = slab_copy(mesh, axis_idx, lo, hi)
                mesh.hide_render = True
                scene.render.filepath = os.path.join(view_dir, f"{name}_{k}.png")
                if not os.path.exists(scene.render.filepath):
                    bpy.ops.render.render(write_still=True)
                bpy.data.objects.remove(slab, do_unlink=True)
            mesh.hide_render = False
        if mesh is not base:
            bpy.data.objects.remove(mesh, do_unlink=True)
        base.hide_render = False


if __name__ == "__main__":
    main()
