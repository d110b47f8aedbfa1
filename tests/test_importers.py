"""Asset-importer tests: mesh file IO, URDF mesh colliders + <inertial>,
and the record-driven MJCF / SNU loader APIs."""

import math
import os
import struct

import numpy as np
import pytest

from diffrl_tpu.sim.importers.meshio import load_mesh
from diffrl_tpu.sim.importers.mjcf import MjcfOptions, load_mjcf, parse_mjcf
from diffrl_tpu.sim.importers.snu import SnuGains, load_snu
from diffrl_tpu.sim.importers.urdf import urdf_load
from diffrl_tpu.sim.model import GEO_MESH, ModelBuilder, np_transform_identity

_ASSETS = os.path.join(
    os.path.dirname(__file__), "..", "diffrl_tpu", "envs", "assets"
)

_CUBE_VERTS = [
    (-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
    (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),
]
# 12 triangles, outward winding
_CUBE_FACES = [
    (0, 2, 1), (0, 3, 2), (4, 5, 6), (4, 6, 7),
    (0, 1, 5), (0, 5, 4), (2, 3, 7), (2, 7, 6),
    (1, 2, 6), (1, 6, 5), (3, 0, 4), (3, 4, 7),
]


def _write_cube_obj(path):
    with open(path, "w") as f:
        for v in _CUBE_VERTS:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in _CUBE_FACES:
            f.write(f"f {a+1}//1 {b+1}//2 {c+1}//3\n")


def _write_cube_stl(path):
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(_CUBE_FACES)))
        for a, b, c in _CUBE_FACES:
            f.write(struct.pack("<3f", 0, 0, 0))  # normal (ignored)
            for i in (a, b, c):
                f.write(struct.pack("<3f", *_CUBE_VERTS[i]))
            f.write(struct.pack("<H", 0))


def test_meshio_obj_cube(tmp_path):
    p = tmp_path / "cube.obj"
    _write_cube_obj(p)
    verts, faces = load_mesh(str(p))
    assert verts.shape == (8, 3)
    assert faces.shape == (36,)


def test_meshio_stl_cube(tmp_path):
    p = tmp_path / "cube.stl"
    _write_cube_stl(p)
    verts, faces = load_mesh(str(p))
    assert verts.shape == (8, 3)
    assert faces.shape == (36,)


def test_meshio_obj_polygon_fan(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    verts, faces = load_mesh(str(p))
    assert verts.shape == (4, 3)
    assert faces.reshape(-1, 3).shape == (2, 3)  # quad -> 2 triangles


_MESH_URDF = """<robot name="meshbot">
  <link name="base">
    <collision>
      <geometry><mesh filename="{mesh}" scale="0.5 0.5 0.5"/></geometry>
    </collision>
    <inertial>
      <origin xyz="0 0 0.1" rpy="0 0 0"/>
      <mass value="2.5"/>
      <inertia ixx="0.4" iyy="0.5" izz="0.6" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
</robot>
"""


def test_urdf_mesh_collider(tmp_path):
    mesh_path = tmp_path / "cube.obj"
    _write_cube_obj(mesh_path)
    urdf_path = tmp_path / "meshbot.urdf"
    urdf_path.write_text(_MESH_URDF.format(mesh="cube.obj"))

    b = ModelBuilder()
    urdf_load(b, str(urdf_path), np_transform_identity(), floating=True)
    assert b.shape_geo_type == [GEO_MESH]
    # density-derived mass of a unit-half-extent cube scaled by 0.5:
    # volume = (2*0.5)^3 = 1 -> mass 1000
    assert b.body_mass[0] == pytest.approx(1000.0, rel=1e-6)
    # 8 mesh vertices -> 8 candidate ground-contact points
    m = b.finalize()
    assert m.topology.contact_count == 8


def test_urdf_inertial_override(tmp_path):
    mesh_path = tmp_path / "cube.obj"
    _write_cube_obj(mesh_path)
    urdf_path = tmp_path / "meshbot.urdf"
    urdf_path.write_text(_MESH_URDF.format(mesh="cube.obj"))

    b = ModelBuilder()
    urdf_load(b, str(urdf_path), np_transform_identity(), floating=True,
              parse_inertial=True)
    assert b.body_mass[0] == pytest.approx(2.5)
    np.testing.assert_allclose(b.body_com[0], [0.0, 0.0, 0.1])
    np.testing.assert_allclose(
        np.diag(b.body_inertia[0]), [0.4, 0.5, 0.6], rtol=1e-12
    )


def test_urdf_package_uri(tmp_path):
    meshes = tmp_path / "mypkg" / "meshes"
    meshes.mkdir(parents=True)
    _write_cube_obj(meshes / "cube.obj")
    urdf_dir = tmp_path / "mypkg" / "urdf"
    urdf_dir.mkdir()
    urdf_path = urdf_dir / "bot.urdf"
    urdf_path.write_text(
        _MESH_URDF.format(mesh="package://mypkg/meshes/cube.obj")
    )
    b = ModelBuilder()
    urdf_load(b, str(urdf_path), np_transform_identity(), floating=True)
    assert b.shape_geo_type == [GEO_MESH]


def test_load_mjcf_matches_kwarg_wrapper():
    """New options-object API and the kwarg wrapper build identical scenes."""
    path = os.path.join(_ASSETS, "ant.xml")

    b1, b2 = ModelBuilder(), ModelBuilder()
    load_mjcf(path, b1, MjcfOptions(shape_ke=4.0e4, shape_mu=0.75,
                                    joint_limit_ke=1.0e3, joint_limit_kd=1.0e1,
                                    joint_armature=0.05))
    parse_mjcf(path, b2, contact_ke=4.0e4, contact_mu=0.75,
               limit_ke=1.0e3, limit_kd=1.0e1, armature=0.05)

    assert b1.joint_type == b2.joint_type
    assert b1.joint_parent == b2.joint_parent
    np.testing.assert_array_equal(
        np.asarray(b1.joint_X_pj), np.asarray(b2.joint_X_pj)
    )
    np.testing.assert_array_equal(
        np.asarray(b1.shape_transform), np.asarray(b2.shape_transform)
    )
    np.testing.assert_array_equal(
        np.asarray(b1.body_mass), np.asarray(b2.body_mass)
    )


def test_load_snu_lower_body():
    from diffrl_tpu.envs.snu_humanoid import _FILTER

    snu_dir = os.path.join(_ASSETS, "snu")
    b = ModelBuilder()
    loaded = load_snu(
        os.path.join(snu_dir, "human.xml"),
        os.path.join(snu_dir, "muscle284.xml"),
        b,
        include=_FILTER,
        gains=SnuGains(),
    )
    # lower-body selection: 11 bones kept, 152 of 284 muscles survive
    kept = [l for l in loaded.links.values() if l != -1]
    assert len(kept) == len(b.joint_type)
    assert len(loaded.muscles) == 152
    assert all(m.peak_force > 0 for m in loaded.muscles)
    # every waypoint resolves to a kept link
    assert all(l in kept for m in loaded.muscles for l in m.links)
