"""MJCF (MuJoCo XML) importer.

Behavioral port of the reference's parser (/root/reference/utils/
load_utils.py:289-488): one link per <joint>, shapes attached to the last
joint of each <body>, capsules re-aligned from MuJoCo's fromto/z-axis
conventions to the engine's x-axis capsules. Host-side numpy only.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET

import numpy as np

from ..model import (
    JOINT_BALL,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ModelBuilder,
    np_quat_from_axis_angle,
    np_quat_mul,
    np_transform,
)

_TYPE_MAP = {
    "ball": JOINT_BALL,
    "hinge": JOINT_REVOLUTE,
    "slide": JOINT_PRISMATIC,
    "free": JOINT_FREE,
    "fixed": JOINT_FIXED,
}

_QUAT_IDENT = np.array([0.0, 0.0, 0.0, 1.0])


def _parse_float(node, key, default):
    return float(node.attrib[key]) if key in node.attrib else default


def _parse_bool(node, key, default):
    if key in node.attrib:
        return node.attrib[key] == "true"
    return default


def _parse_vec(node, key, default):
    if key in node.attrib:
        return np.fromstring(node.attrib[key], sep=" ")
    return np.array(default, dtype=np.float64)


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 1e-12 else v


def parse_mjcf(
    filename,
    builder: ModelBuilder,
    density=1000.0,
    stiffness=0.0,
    damping=1.0,
    contact_ke=1e4,
    contact_kd=1e4,
    contact_kf=1e3,
    contact_mu=0.5,
    limit_ke=100.0,
    limit_kd=10.0,
    armature=0.01,
    radians=False,
    load_stiffness=False,
    load_armature=False,
):
    file = ET.parse(filename)
    root = file.getroot()

    def parse_body(body, parent, last_joint_pos):
        body_pos = np.fromstring(body.attrib["pos"], sep=" ")
        link = parent

        for joint in body.findall("joint"):
            joint_type = _TYPE_MAP[joint.attrib.get("type", "hinge")]
            joint_axis = _parse_vec(joint, "axis", (0.0, 0.0, 0.0))
            joint_pos = _parse_vec(joint, "pos", (0.0, 0.0, 0.0))
            joint_limited = _parse_bool(joint, "limited", True)
            if joint_limited:
                if radians:
                    joint_range = _parse_vec(
                        joint, "range", (math.radians(-170.0), math.radians(170.0))
                    )
                else:
                    joint_range = np.deg2rad(_parse_vec(joint, "range", (-170.0, 170.0)))
            else:
                joint_range = np.array([-1.0e6, 1.0e6])

            joint_stiffness = (
                _parse_float(joint, "stiffness", stiffness) if load_stiffness else stiffness
            )
            joint_damping = _parse_float(joint, "damping", damping)
            joint_armature = (
                _parse_float(joint, "armature", armature) if load_armature else armature
            )

            joint_axis = _normalize(joint_axis)

            if parent == -1:
                body_pos = np.zeros(3)

            link = builder.add_link(
                parent,
                X_pj=np_transform(body_pos + joint_pos - last_joint_pos, _QUAT_IDENT),
                axis=joint_axis,
                type=joint_type,
                limit_lower=float(joint_range[0]),
                limit_upper=float(joint_range[1]),
                limit_ke=limit_ke,
                limit_kd=limit_kd,
                stiffness=joint_stiffness,
                damping=joint_damping,
                armature=joint_armature,
            )

            parent = link
            body_pos = np.zeros(3)
            last_joint_pos = joint_pos

        for geom in body.findall("geom"):
            geom_type = geom.attrib["type"]
            geom_size = _parse_vec(geom, "size", [1.0])
            geom_pos = _parse_vec(geom, "pos", (0.0, 0.0, 0.0))
            geom_rot = _parse_vec(geom, "quat", (0.0, 0.0, 0.0, 1.0))

            if geom_type == "sphere":
                builder.add_shape_sphere(
                    link,
                    pos=geom_pos - last_joint_pos,
                    rot=geom_rot,
                    radius=float(geom_size[0]),
                    density=density,
                    ke=contact_ke,
                    kd=contact_kd,
                    kf=contact_kf,
                    mu=contact_mu,
                )
            elif geom_type == "capsule":
                if "fromto" in geom.attrib:
                    fromto = _parse_vec(geom, "fromto", (0.0, 0.0, 0.0, 1.0, 0.0, 0.0))
                    start, end = fromto[0:3], fromto[3:6]
                    axis = _normalize(end - start)
                    angle = math.acos(np.clip(np.dot(axis, (1.0, 0.0, 0.0)), -1.0, 1.0))
                    axis = _normalize(np.cross(axis, (1.0, 0.0, 0.0)))
                    geom_pos = (start + end) * 0.5
                    geom_rot = np_quat_from_axis_angle(axis, -angle)
                    geom_radius = float(geom_size[0])
                    geom_width = float(np.linalg.norm(end - start) * 0.5)
                else:
                    geom_radius = float(geom_size[0])
                    geom_width = float(geom_size[1])
                    geom_pos = _parse_vec(geom, "pos", (0.0, 0.0, 0.0))
                    if "axisangle" in geom.attrib:
                        aa = _parse_vec(geom, "axisangle", (0.0, 1.0, 0.0, 0.0))
                        geom_rot = np_quat_from_axis_angle(aa[0:3], float(aa[3]))
                    if "quat" in geom.attrib:
                        geom_rot = _parse_vec(geom, "quat", _QUAT_IDENT)
                    geom_rot = np_quat_mul(
                        geom_rot, np_quat_from_axis_angle((0.0, 1.0, 0.0), -math.pi * 0.5)
                    )
                builder.add_shape_capsule(
                    link,
                    pos=geom_pos - last_joint_pos,
                    rot=geom_rot,
                    radius=geom_radius,
                    half_width=geom_width,
                    density=density,
                    ke=contact_ke,
                    kd=contact_kd,
                    kf=contact_kf,
                    mu=contact_mu,
                )
            # other geom types unsupported (parity with the reference)

        for child in body.findall("body"):
            parse_body(child, link, last_joint_pos)

    builder.add_articulation()
    world = root.find("worldbody")
    for body in world.findall("body"):
        parse_body(body, -1, np.zeros(3))
