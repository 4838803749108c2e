"""Blender (bpy) script: render N input views of one object + camera meta.

Run by gen_input.py as ``blender -b -P blender_script_input.py -- <args>``.
Behavior of the reference renderer (render_slices/blender_script_input.py):

* import the .glb, normalize so the bounding-box body diagonal is 1, apply
  a random extra scale in [0.75, 1.1] and record (scale, offset);
* N cameras evenly spaced in azimuth with random elevation in [-10, 40]
  degrees at distance 1.2, 35mm focal length on a 32mm sensor;
* render RGBA PNGs (film_transparent) at the requested resolution;
* write meta.pkl = [K, azimuths, elevations, distances, cam_poses(3x4 RT),
  scale_rand, offset_rand] — the exact layout the dataset reader expects
  (slice3d_tpu/data/dataset.py load_camera).
"""

import argparse
import math
import os
import pickle
import random
import sys

import bpy
import numpy as np
from mathutils import Vector


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--object_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--n_views", type=int, default=12)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--distance", type=float, default=1.2)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def reset_scene():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()
    for block in (bpy.data.meshes, bpy.data.materials, bpy.data.images):
        for item in list(block):
            if item.users == 0:
                block.remove(item)


def scene_meshes():
    return [o for o in bpy.context.scene.objects if o.type == "MESH"]


def scene_bbox():
    lo = Vector((1e9, 1e9, 1e9))
    hi = Vector((-1e9, -1e9, -1e9))
    for obj in scene_meshes():
        for corner in obj.bound_box:
            world = obj.matrix_world @ Vector(corner)
            lo = Vector(map(min, lo, world))
            hi = Vector(map(max, hi, world))
    return lo, hi


def normalize_scene(rng):
    lo, hi = scene_bbox()
    diag = (hi - lo).length
    scale_rand = rng.uniform(0.75, 1.1)
    scale = scale_rand / max(diag, 1e-9)
    for obj in scene_meshes():
        if obj.parent is None:
            obj.scale = obj.scale * scale
    bpy.context.view_layer.update()
    lo, hi = scene_bbox()
    offset = -(lo + hi) / 2
    for obj in scene_meshes():
        if obj.parent is None:
            obj.matrix_world.translation += offset
    bpy.context.view_layer.update()
    return scale, np.array([offset.x, offset.y, offset.z])


def make_camera():
    cam_data = bpy.data.cameras.new("cam")
    cam_data.lens = 35.0
    cam_data.sensor_width = 32.0
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    return cam


def look_at_origin(cam, az, el, dist):
    x = dist * math.cos(el) * math.cos(az)
    y = dist * math.cos(el) * math.sin(az)
    z = dist * math.sin(el)
    cam.location = (x, y, z)
    direction = -Vector((x, y, z))
    cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
    bpy.context.view_layer.update()


def rt_matrix(cam):
    """World->camera 3x4 RT in the dataset convention."""
    m = cam.matrix_world.inverted()
    return np.array([[m[i][j] for j in range(4)] for i in range(3)])


def main():
    args = parse_args()
    rng = random.Random(args.seed or None)
    reset_scene()
    bpy.ops.import_scene.gltf(filepath=args.object_path)
    scale, offset = normalize_scene(rng)

    scene = bpy.context.scene
    scene.render.engine = "BLENDER_EEVEE" if hasattr(bpy.types, "SceneEEVEE") else "CYCLES"
    scene.render.film_transparent = True
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.image_settings.color_mode = "RGBA"

    light_data = bpy.data.lights.new("sun", type="SUN")
    light = bpy.data.objects.new("sun", light_data)
    scene.collection.objects.link(light)
    light.rotation_euler = (0.6, 0.2, 0.4)

    cam = make_camera()
    os.makedirs(args.output_dir, exist_ok=True)

    n = args.n_views
    azimuths, elevations, distances, poses = [], [], [], []
    f = 35.0 / 32.0 * args.resolution
    k = np.array([[f, 0, args.resolution / 2],
                  [0, f, args.resolution / 2],
                  [0, 0, 1.0]])
    for v in range(n):
        az = 2 * math.pi * v / n
        el = math.radians(rng.uniform(-10.0, 40.0))
        look_at_origin(cam, az, el, args.distance)
        scene.render.filepath = os.path.join(args.output_dir, "%03d.png" % v)
        bpy.ops.render.render(write_still=True)
        azimuths.append(az)
        elevations.append(el)
        distances.append(args.distance)
        poses.append(rt_matrix(cam))

    with open(os.path.join(args.output_dir, "meta.pkl"), "wb") as fh:
        pickle.dump(
            [k, np.array(azimuths), np.array(elevations), np.array(distances),
             np.array(poses), scale, offset],
            fh,
        )


if __name__ == "__main__":
    main()
