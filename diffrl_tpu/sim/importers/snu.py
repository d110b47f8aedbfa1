"""SNU biomechanics importer: skeleton + muscle XML.

Behavioral port of the reference Skeleton/MuscleUnit parser
(/root/reference/utils/load_utils.py:493-718): Node/Body/Joint elements with
3x3 linear + translation world transforms, mass-scaled limit/stiffness gains,
box collision shapes, and muscle Units with waypoints transformed into
joint-local frames.
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET

import numpy as np

from ..model import (
    JOINT_BALL,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ModelBuilder,
    np_quat_from_matrix,
    np_transform,
    np_transform_identity,
    np_transform_inverse,
    np_transform_multiply,
    np_transform_point,
)

_TYPE_MAP = {
    "Ball": JOINT_BALL,
    "Revolute": JOINT_REVOLUTE,
    "Prismatic": JOINT_PRISMATIC,
    "Free": JOINT_FREE,
    "Fixed": JOINT_FIXED,
}


class MuscleUnit:
    def __init__(self):
        self.name = ""
        self.bones = []
        self.points = []
        self.muscle_strength = 0.0


class Skeleton:
    def __init__(
        self,
        skeleton_file,
        muscle_file,
        builder: ModelBuilder,
        filter=(),
        stiffness=5.0,
        damping=2.0,
        contact_ke=5000.0,
        contact_kd=2000.0,
        contact_kf=1000.0,
        contact_mu=0.5,
        limit_ke=1000.0,
        limit_kd=10.0,
        armature=0.05,
    ):
        self.armature = armature
        self.stiffness = stiffness
        self.damping = damping
        self.contact_ke = contact_ke
        self.contact_kd = contact_kd
        self.contact_kf = contact_kf
        self.contact_mu = contact_mu
        self.limit_ke = limit_ke
        self.limit_kd = limit_kd

        self.parse_skeleton(skeleton_file, builder, set(filter))
        if muscle_file is not None:
            self.parse_muscles(muscle_file, builder)

    def parse_skeleton(self, filename, builder, filter):
        file = ET.parse(filename)
        root = file.getroot()

        self.node_map = {}
        self.xform_map = {}
        self.mesh_map = {}
        self.coord_start = len(builder.joint_q)
        self.dof_start = len(builder.joint_qd)

        builder.add_articulation()

        for child in root:
            if child.tag != "Node":
                continue

            body = child.find("Body")
            joint = child.find("Joint")
            name = child.attrib["name"]
            parent_name = child.attrib["parent"]

            if parent_name in self.node_map:
                parent_link = self.node_map[parent_name]
                parent_X_s = self.xform_map[parent_name]
            else:
                parent_link = -1
                parent_X_s = np_transform_identity()

            body_xform = body.find("Transformation")
            joint_xform = joint.find("Transformation")

            body_size = np.fromstring(body.attrib["size"], sep=" ")
            body_mass = float(body.attrib["mass"])
            x, y, z = body_size[0], body_size[1], body_size[2]
            density = body_mass / (x * y * z)

            mass_scale = body_mass / 15.0  # max_body_mass (load_utils.py:588)

            body_R_s = np.fromstring(body_xform.attrib["linear"], sep=" ").reshape((3, 3))
            body_t_s = np.fromstring(body_xform.attrib["translation"], sep=" ")
            joint_R_s = np.fromstring(joint_xform.attrib["linear"], sep=" ").reshape((3, 3))
            joint_t_s = np.fromstring(joint_xform.attrib["translation"], sep=" ")

            joint_type = _TYPE_MAP[joint.attrib["type"]]

            joint_lower, joint_upper = -1.0e3, 1.0e3
            if joint_type == JOINT_REVOLUTE:
                if "lower" in joint.attrib:
                    joint_lower = float(np.fromstring(joint.attrib["lower"], sep=" ")[0])
                if "upper" in joint.attrib:
                    joint_upper = float(np.fromstring(joint.attrib["upper"], sep=" ")[0])

            if "axis" in joint.attrib:
                joint_axis = np.fromstring(joint.attrib["axis"], sep=" ")
            else:
                joint_axis = np.zeros(3)

            body_X_s = np_transform(body_t_s, np_quat_from_matrix(body_R_s))
            joint_X_s = np_transform(joint_t_s, np_quat_from_matrix(joint_R_s))

            link = -1
            if len(filter) == 0 or name in filter:
                joint_X_p = np_transform_multiply(np_transform_inverse(parent_X_s), joint_X_s)
                body_X_c = np_transform_multiply(np_transform_inverse(joint_X_s), body_X_s)
                if parent_link == -1:
                    joint_X_p = np_transform_identity()

                link = builder.add_link(
                    parent=parent_link,
                    X_pj=joint_X_p,
                    axis=joint_axis,
                    type=joint_type,
                    limit_lower=joint_lower,
                    limit_upper=joint_upper,
                    limit_ke=self.limit_ke * mass_scale,
                    limit_kd=self.limit_kd * mass_scale,
                    damping=self.damping,
                    stiffness=self.stiffness * math.sqrt(mass_scale),
                    armature=self.armature,
                )
                builder.add_shape_box(
                    body=link,
                    pos=body_X_c[0:3],
                    rot=body_X_c[3:7],
                    hx=x * 0.5,
                    hy=y * 0.5,
                    hz=z * 0.5,
                    density=density,
                    ke=self.contact_ke,
                    kd=self.contact_kd,
                    kf=self.contact_kf,
                    mu=self.contact_mu,
                )

            self.xform_map[name] = joint_X_s
            self.node_map[name] = link
            self.mesh_map[os.path.splitext(body.attrib["obj"])[0]] = link

    def parse_muscles(self, filename, builder):
        muscles = []
        file = ET.parse(filename)
        root = file.getroot()
        self.muscle_start = len(builder.muscle_activation)

        for child in root:
            if child.tag != "Unit":
                continue
            unit_f0 = float(child.attrib["f0"])
            unit_lm = float(child.attrib["lm"])
            unit_lt = float(child.attrib["lt"])
            unit_lmax = float(child.attrib["lmax"])
            unit_pen = float(child.attrib["pen_angle"])

            m = MuscleUnit()
            m.name = child.attrib["name"]
            m.muscle_strength = unit_f0

            incomplete = False
            for waypoint in child.iter("Waypoint"):
                way_bone = waypoint.attrib["body"]
                way_link = self.node_map[way_bone]
                way_loc = np.fromstring(waypoint.attrib["p"], sep=" ")
                if way_link == -1:
                    incomplete = True
                    break
                joint_X_s = self.xform_map[way_bone]
                way_loc = np_transform_point(np_transform_inverse(joint_X_s), way_loc)
                m.bones.append(way_link)
                m.points.append(way_loc)

            if not incomplete:
                muscles.append(m)
                builder.add_muscle(
                    m.bones, m.points, f0=unit_f0, lm=unit_lm, lt=unit_lt,
                    lmax=unit_lmax, pen=unit_pen,
                )

        self.muscles = muscles
