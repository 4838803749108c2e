"""Blender (bpy) script: cut an object into 4 slabs per axis and render.

Run by gen_slices.py.  Behavior of the reference slicer
(render_slices/blender_script_slices.py):

* re-apply the normalization recorded in meta.pkl (scale + offset) so the
  slices line up with the input views;
* per view: in 'camera' mode rotate a duplicated mesh into the camera
  frame so slabs are camera-aligned; in 'axis' mode keep canonical axes;
* per axis (X, Y, Z): compute the mesh extent, cut 4 equal slabs with
  bisect clipping, render each slab alone (other objects hidden) with the
  camera reset to the canonical distance-1.2 pose;
* write ``<view>/{axis}_{slab}.png``; Z and Y slab ordering conventions
  follow the dataset layout (the reader handles the Z reversal).
"""

import argparse
import math
import os
import pickle
import sys

import bpy
import numpy as np
from mathutils import Matrix, Vector


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


def camera_pose(az, el, dist):
    x = dist * math.cos(el) * math.cos(az)
    y = dist * math.cos(el) * math.sin(az)
    z = dist * math.sin(el)
    loc = Vector((x, y, z))
    rot = (-loc).to_track_quat("-Z", "Y")
    return loc, rot


def make_camera(dist):
    cam_data = bpy.data.cameras.new("cam")
    cam_data.lens = 35.0
    cam_data.sensor_width = 32.0
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    # canonical pose: on +X axis looking at the origin
    loc, rot = camera_pose(0.0, 0.0, dist)
    cam.location = loc
    cam.rotation_euler = rot.to_euler()
    return cam


def duplicate_rotated(obj, az, el):
    """Copy of obj with vertices rotated into the camera-aligned frame."""
    dup = obj.copy()
    dup.data = obj.data.copy()
    bpy.context.scene.collection.objects.link(dup)
    rot = (
        Matrix.Rotation(-el, 4, "Y") @ Matrix.Rotation(-az, 4, "Z")
    )
    dup.data.transform(rot)
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

    cam = make_camera(float(distances[0]))

    axes = [("X", 0, False), ("Y", 1, False), ("Z", 2, True)]
    for v in range(args.n_views):
        view_dir = os.path.join(args.output_dir, "%03d" % v)
        os.makedirs(view_dir, exist_ok=True)
        if args.slice_direction == "camera":
            mesh = duplicate_rotated(base, float(azimuths[v]), float(elevations[v]))
        else:
            mesh = base
        coords = np.array([tuple(vv.co) for vv in mesh.data.vertices])
        base.hide_render = True
        for name, axis_idx, reverse in axes:
            lo, hi = coords[:, axis_idx].min(), coords[:, axis_idx].max()
            edges = np.linspace(lo - 1e-5, hi + 1e-5, 5)
            order = range(4)
            for i in order:
                slab = slab_copy(mesh, axis_idx, float(edges[i]), float(edges[i + 1]))
                mesh.hide_render = True
                part = 4 - i if reverse else i + 1
                scene.render.filepath = os.path.join(view_dir, f"{name}_{part}.png")
                if not os.path.exists(scene.render.filepath):
                    bpy.ops.render.render(write_still=True)
                bpy.data.objects.remove(slab, do_unlink=True)
            mesh.hide_render = False
        if mesh is not base:
            bpy.data.objects.remove(mesh, do_unlink=True)
        base.hide_render = False


if __name__ == "__main__":
    main()
