"""Blender → ignis_tpu scene exporter add-on.

Functional port of the reference's scripts/blender_exporter/ignis_blender
(18 modules, ~3k LoC) scoped to the scene features ignis_tpu consumes:
meshes (exported as PLY), Principled-BSDF materials, point/spot/area/sun
lights, the world background (constant or environment image), camera and
film settings.  Install as a Blender add-on and use
File > Export > ignis_tpu scene (.json), or call `export_scene(ctx, path)`
from scripts.

NOTE: developed without a Blender installation in this environment —
the bpy surface used here is the stable 2.8+ API also used by the
reference exporter.
"""

bl_info = {
    "name": "ignis_tpu scene exporter",
    "author": "ignis_tpu",
    "version": (0, 1, 0),
    "blender": (2, 80, 0),
    "location": "File > Import-Export",
    "description": "Export scene to the ignis_tpu (Ignis) JSON format",
    "category": "Import-Export",
}

import json
import math
import os


def _color3(c):
    return [float(c[0]), float(c[1]), float(c[2])]


def _matrix(m):
    """Blender 4x4 (row-major Matrix) -> reference row-major 16 floats."""
    return [float(m[r][c]) for r in range(4) for c in range(4)]


def _export_material(mat):
    """Principled BSDF node -> ignis principled entry (reference
    export_material.py semantics)."""
    out = {"type": "principled", "name": mat.name}
    node = None
    if mat.use_nodes:
        for n in mat.node_tree.nodes:
            if n.bl_idname == "ShaderNodeBsdfPrincipled":
                node = n
                break
    if node is None:
        out.update(type="diffuse",
                   reflectance=_color3(mat.diffuse_color))
        return out

    def inp(name, default=None):
        s = node.inputs.get(name)
        if s is None:
            return default
        v = s.default_value
        try:
            return _color3(v)
        except TypeError:
            return float(v)

    out["base_color"] = inp("Base Color", [0.8, 0.8, 0.8])
    out["metallic"] = inp("Metallic", 0.0)
    out["roughness"] = inp("Roughness", 0.5)
    out["ior"] = inp("IOR", 1.45)
    tr = inp("Transmission", None)
    if tr is None:
        tr = inp("Transmission Weight", 0.0)  # Blender 4.x
    out["specular_transmission"] = tr or 0.0
    sheen = inp("Sheen", None)
    if sheen is None:
        sheen = inp("Sheen Weight", 0.0)
    out["sheen"] = sheen or 0.0
    cc = inp("Clearcoat", None)
    if cc is None:
        cc = inp("Coat Weight", 0.0)
    out["clearcoat"] = cc or 0.0
    out["anisotropic"] = inp("Anisotropic", 0.0) or 0.0
    return out


def _export_light(obj):
    li = obj.data
    pos = list(obj.matrix_world.translation)
    if li.type == "POINT":
        return {"type": "point", "name": obj.name,
                "position": [float(v) for v in pos],
                "power": [li.energy * c for c in _color3(li.color)]}
    if li.type == "SPOT":
        d = obj.matrix_world.to_3x3() @ type(obj.matrix_world.translation)(
            (0.0, 0.0, -1.0))
        return {"type": "spot", "name": obj.name,
                "position": [float(v) for v in pos],
                "direction": [float(v) for v in d],
                "cutoff": math.degrees(li.spot_size) / 2.0,
                "falloff": math.degrees(li.spot_size) / 2.0
                * (1.0 - li.spot_blend),
                "power": [li.energy * c for c in _color3(li.color)]}
    if li.type == "SUN":
        d = obj.matrix_world.to_3x3() @ type(obj.matrix_world.translation)(
            (0.0, 0.0, -1.0))
        return {"type": "directional", "name": obj.name,
                "direction": [float(v) for v in d],
                "irradiance": [li.energy * c for c in _color3(li.color)]}
    if li.type == "AREA":
        return {"type": "area", "name": obj.name, "entity": obj.name,
                "power": [li.energy * c for c in _color3(li.color)]}
    return None


def _export_world(world, out_dir):
    if world is None or not world.use_nodes:
        return None
    bg = None
    env = None
    for n in world.node_tree.nodes:
        if n.bl_idname == "ShaderNodeBackground":
            bg = n
        elif n.bl_idname == "ShaderNodeTexEnvironment":
            env = n
    if env is not None and env.image is not None:
        img_path = os.path.join(out_dir, "textures",
                                os.path.basename(env.image.filepath or
                                                 env.image.name + ".exr"))
        os.makedirs(os.path.dirname(img_path), exist_ok=True)
        try:
            env.image.save_render(img_path)
        except Exception:
            pass
        return ({"type": "image", "name": "__world_tex",
                 "filename": os.path.relpath(img_path, out_dir)},
                {"type": "env", "name": "__world", "radiance": "__world_tex",
                 "scale": float(bg.inputs["Strength"].default_value)
                 if bg else 1.0})
    if bg is not None:
        col = _color3(bg.inputs["Color"].default_value)
        s = float(bg.inputs["Strength"].default_value)
        if max(col) * s > 0:
            return (None, {"type": "constant", "name": "__world",
                           "radiance": [c * s for c in col]})
    return None


def export_scene(context, filepath):
    import bpy

    out_dir = os.path.dirname(os.path.abspath(filepath))
    mesh_dir = os.path.join(out_dir, "meshes")
    os.makedirs(mesh_dir, exist_ok=True)

    scene = context.scene
    cam = scene.camera
    doc = {
        "technique": {"type": "path", "max_depth": 8},
        "film": {"size": [scene.render.resolution_x,
                          scene.render.resolution_y]},
        "textures": [], "bsdfs": [], "shapes": [], "entities": [],
        "lights": [],
    }
    if cam is not None:
        doc["camera"] = {
            "type": "perspective",
            "fov": math.degrees(cam.data.angle),
            "near_clip": cam.data.clip_start,
            "far_clip": cam.data.clip_end,
            "transform": _matrix(cam.matrix_world),
        }

    mats = set()
    for obj in scene.objects:
        if obj.hide_render:
            continue
        if obj.type == "LIGHT":
            li = _export_light(obj)
            if li is not None:
                doc["lights"].append(li)
            continue
        if obj.type != "MESH":
            continue
        ply = os.path.join(mesh_dir, f"{obj.name}.ply")
        dg = context.evaluated_depsgraph_get()
        ev = obj.evaluated_get(dg)
        me = ev.to_mesh()
        _write_ply(me, ply)
        ev.to_mesh_clear()
        doc["shapes"].append({"type": "ply", "name": obj.name,
                              "filename": os.path.relpath(ply, out_dir)})
        mat = obj.active_material
        mname = mat.name if mat else "__default"
        if mat and mat.name not in mats:
            doc["bsdfs"].append(_export_material(mat))
            mats.add(mat.name)
        elif not mat and "__default" not in mats:
            doc["bsdfs"].append({"type": "diffuse", "name": "__default",
                                 "reflectance": 0.8})
            mats.add("__default")
        doc["entities"].append({
            "name": obj.name, "shape": obj.name, "bsdf": mname,
            "transform": _matrix(obj.matrix_world)})

    w = _export_world(scene.world, out_dir)
    if w is not None:
        tex, light = w
        if tex is not None:
            doc["textures"].append(tex)
        doc["lights"].append(light)

    with open(filepath, "w") as f:
        json.dump(doc, f, indent=1)
    return {"FINISHED"}


def _write_ply(me, path):
    """Minimal binary-less ascii PLY writer (triangulated)."""
    me.calc_loop_triangles()
    verts = me.vertices
    tris = me.loop_triangles
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v.co[0]} {v.co[1]} {v.co[2]}\n")
        for t in tris:
            a, b, c = t.vertices
            f.write(f"3 {a} {b} {c}\n")


# ---- Blender operator / menu glue
try:
    import bpy
    from bpy_extras.io_utils import ExportHelper

    class ExportIgnisTpu(bpy.types.Operator, ExportHelper):
        bl_idname = "export_scene.ignis_tpu"
        bl_label = "Export ignis_tpu scene"
        filename_ext = ".json"

        def execute(self, context):
            return export_scene(context, self.filepath)

    def menu_func(self, context):
        self.layout.operator(ExportIgnisTpu.bl_idname,
                             text="ignis_tpu scene (.json)")

    def register():
        bpy.utils.register_class(ExportIgnisTpu)
        bpy.types.TOPBAR_MT_file_export.append(menu_func)

    def unregister():
        bpy.utils.unregister_class(ExportIgnisTpu)
        bpy.types.TOPBAR_MT_file_export.remove(menu_func)
except ImportError:  # imported outside Blender (tests, linting)
    def register():
        pass

    def unregister():
        pass
