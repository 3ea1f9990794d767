#!/usr/bin/env python
"""Extract a quadruped robot model from a URDF into the wtw_tpu JSON spec.

This replaces Isaac Gym's `gym.load_asset` (reference:
go1_gym/envs/base/legged_robot.py:1509) with a build-time tool: the URDF is
parsed once, fixed joints are collapsed into their parents (the reference
sets `collapse_fixed_joints=True`, legged_robot.py:1496), collision geometry
is approximated by spheres (the contact primitives of our penalty-contact
engine), and everything is written as a plain-JSON numeric spec that
`wtw_tpu.models.robot.RobotModel` loads into arrays.

Usage:
    python tools/extract_urdf.py <robot.urdf> <out.json> [--foot-name foot]
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import xml.etree.ElementTree as ET

import numpy as np


def rpy_to_matrix(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def matrix_to_quat_xyzw(R):
    t = np.trace(R)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = [0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z = q
        w = (R[k, j] - R[j, k]) / s
    return [float(x), float(y), float(z), float(w)]


def parse_origin(el):
    xyz = np.zeros(3)
    rpy = np.zeros(3)
    if el is not None:
        o = el.find("origin")
        if o is not None:
            if o.get("xyz"):
                xyz = np.array([float(v) for v in o.get("xyz").split()])
            if o.get("rpy"):
                rpy = np.array([float(v) for v in o.get("rpy").split()])
    return xyz, rpy


class Link:
    def __init__(self, el):
        self.name = el.get("name")
        inert = el.find("inertial")
        if inert is not None:
            self.mass = float(inert.find("mass").get("value"))
            xyz, rpy = parse_origin_el(inert)
            self.com = xyz
            self.com_R = rpy_to_matrix(rpy)
            I = inert.find("inertia")
            ixx, iyy, izz = (float(I.get(k)) for k in ("ixx", "iyy", "izz"))
            ixy, ixz, iyz = (float(I.get(k, "0")) for k in ("ixy", "ixz", "iyz"))
            self.inertia = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
        else:
            self.mass = 0.0
            self.com = np.zeros(3)
            self.com_R = np.eye(3)
            self.inertia = np.zeros((3, 3))
        self.collisions = []
        for col in el.findall("collision"):
            xyz, rpy = parse_origin_el(col)
            g = list(col.find("geometry"))[0]
            self.collisions.append((g.tag, g.attrib, xyz, rpy_to_matrix(rpy)))


def parse_origin_el(el):
    o = el.find("origin")
    xyz = np.zeros(3)
    rpy = np.zeros(3)
    if o is not None:
        if o.get("xyz"):
            xyz = np.array([float(v) for v in o.get("xyz").split()])
        if o.get("rpy"):
            rpy = np.array([float(v) for v in o.get("rpy").split()])
    return xyz, rpy


def geom_to_spheres(tag, attrib, xyz, R):
    """Approximate a collision geometry by spheres: (offset, radius) list."""
    pts = []
    if tag == "sphere":
        r = float(attrib["radius"])
        pts.append((xyz, r))
    elif tag == "box":
        size = np.array([float(v) for v in attrib["size"].split()])
        order = np.argsort(size)
        if (size[order[2]] > 1.5 * size[order[1]]
                and size[order[1]] < 1.6 * size[order[0]]):
            # elongated box (thigh/calf links): capsule-style sphere chain
            # along the long axis — 3 spheres instead of 8 corners. Contact
            # sensing is equivalent and the sphere count drives the cost of
            # the whole contact solve (P x 3 x nv Jacobians per env).
            r = 0.5 * size[order[1]]
            axis = np.zeros(3)
            axis[order[2]] = 1.0
            h = size[order[2]] / 2 - r
            for s in (-1.0, 0.0, 1.0):
                pts.append((xyz + R @ (axis * h * s), r))
        else:
            sx, sy, sz = size
            r = 0.25 * min(sx, sy, sz)
            hx, hy, hz = sx / 2 - r, sy / 2 - r, sz / 2 - r
            for ix in (-1, 1):
                for iy in (-1, 1):
                    for iz in (-1, 1):
                        local = np.array([ix * hx, iy * hy, iz * hz])
                        pts.append((xyz + R @ local, r))
    elif tag == "cylinder":
        r = float(attrib["radius"])
        h = float(attrib["length"]) / 2
        axis = R @ np.array([0.0, 0.0, 1.0])
        for s in (-1, 1):
            pts.append((xyz + axis * max(h - r * 0.5, 0.0) * s, r))
    elif tag == "capsule":
        r = float(attrib["radius"])
        h = float(attrib["length"]) / 2
        axis = R @ np.array([0.0, 0.0, 1.0])
        for s in (-1, 1):
            pts.append((xyz + axis * h * s, r))
    elif tag == "mesh":
        pass  # meshes are visual-grade; skip (reference uses primitive collisions)
    return pts


def classify(name, foot_name):
    n = name.lower()
    if foot_name in n:
        return "foot"
    if "calf" in n or "shank" in n or "lower" in n:
        return "calf"
    if "thigh" in n or "upper" in n:
        return "thigh"
    if "hip" in n or "abduct" in n:
        return "hip"
    return "base"


def leg_of(name):
    for i, tag in enumerate(("FR", "FL", "RR", "RL")):
        if name.startswith(tag) or f"_{tag.lower()}_" in name.lower():
            return i
    return -1


def extract(urdf_path, foot_name="foot"):
    tree = ET.parse(urdf_path)
    root = tree.getroot()

    links = {}
    for el in root.findall("link"):
        links[el.get("name")] = Link(el)

    joints = []  # (name, type, parent, child, xyz, R, axis, limits, dynamics)
    for el in root.findall("joint"):
        xyz, rpy = parse_origin_el(el)
        axis_el = el.find("axis")
        axis = np.array([1.0, 0, 0])
        if axis_el is not None:
            axis = np.array([float(v) for v in axis_el.get("xyz").split()])
        lim = el.find("limit")
        limits = None
        if lim is not None:
            limits = dict(
                lower=float(lim.get("lower", "-1e9")),
                upper=float(lim.get("upper", "1e9")),
                effort=float(lim.get("effort", "1e9")),
                velocity=float(lim.get("velocity", "1e9")),
            )
        dyn = el.find("dynamics")
        damping = float(dyn.get("damping", "0")) if dyn is not None else 0.0
        friction = float(dyn.get("friction", "0")) if dyn is not None else 0.0
        joints.append(dict(
            name=el.get("name"), type=el.get("type"),
            parent=el.find("parent").get("link"), child=el.find("child").get("link"),
            xyz=xyz, R=rpy_to_matrix(rpy), axis=axis, limits=limits,
            damping=damping, friction=friction,
        ))

    # --- collapse fixed joints bottom-up into moving-body groups -----------
    # group[link] = (moving_body_root_link, R_root_link, p_root_link): pose of
    # `link` frame expressed in its moving-body root frame.
    child_of = {j["child"]: j for j in joints}

    def pose_in_root(link):
        """Walk up through fixed joints to the moving root."""
        R = np.eye(3)
        p = np.zeros(3)
        cur = link
        while cur in child_of and child_of[cur]["type"] == "fixed":
            j = child_of[cur]
            R = j["R"] @ R
            p = j["R"] @ p + j["xyz"]
            cur = j["parent"]
        return cur, R, p

    moving_joints = [j for j in joints if j["type"] != "fixed"]
    # root body: the link that is nobody's child via moving joints and whose
    # fixed-chain root has no parent at all
    all_children = {j["child"] for j in joints}
    root_link = next(l for l in links if l not in all_children)
    root_body_link, _, _ = pose_in_root(root_link)

    body_names = [root_link]  # the floating base group keyed by topmost link
    body_root = {root_link: 0}
    # assign moving bodies in URDF order
    for j in moving_joints:
        body_names.append(j["child"])
        body_root[j["child"]] = len(body_names) - 1

    def body_index_of(link):
        cur, R, p = pose_in_root(link)
        if cur == root_link or cur not in body_root:
            # chains ending at the absolute root link belong to body 0
            return 0, R, p
        return body_root[cur], R, p

    nb = len(body_names)
    mass = np.zeros(nb)
    com_sum = np.zeros((nb, 3))
    inertia = np.zeros((nb, 3, 3))  # about body-frame origin (shifted later)
    spheres = []  # dicts
    sites = {}

    for lname, link in links.items():
        bi, R, p = body_index_of(lname)
        m = link.mass
        com_w = R @ link.com + p  # com in body frame
        mass[bi] += m
        com_sum[bi] += m * com_w
        # inertia at link com rotated to body axes
        Rc = R @ link.com_R
        I_c = Rc @ link.inertia @ Rc.T
        # parallel-axis to body origin
        c = com_w
        inertia[bi] += I_c + m * ((c @ c) * np.eye(3) - np.outer(c, c))
        label = classify(lname, foot_name)
        for (tag, attrib, oxyz, oR) in link.collisions:
            for (off, r) in geom_to_spheres(tag, attrib, oxyz, oR):
                spheres.append(dict(
                    body=int(bi), pos=[float(v) for v in (R @ off + p)],
                    radius=float(r), label=label, leg=leg_of(lname),
                    link=lname,
                ))
        if label == "foot":
            sites[lname] = dict(body=int(bi), pos=[float(v) for v in p])

    com = np.where(mass[:, None] > 0, com_sum / np.maximum(mass[:, None], 1e-12), 0.0)
    # shift inertia back to each body's com (stored about com)
    inertia_com = np.zeros_like(inertia)
    for i in range(nb):
        c = com[i]
        inertia_com[i] = inertia[i] - mass[i] * ((c @ c) * np.eye(3) - np.outer(c, c))

    parent_idx = [-1]
    jpos, jquat, jaxis = [], [], []
    lower, upper, effort, vel = [], [], [], []
    jdamp, jfric, jnames = [], [], []
    for j in moving_joints:
        pb, R_pl, p_pl = body_index_of(j["parent"])
        parent_idx.append(int(pb))
        # joint origin in parent *body* frame
        jp = R_pl @ j["xyz"] + p_pl
        jR = R_pl @ j["R"]
        jpos.append([float(v) for v in jp])
        jquat.append(matrix_to_quat_xyzw(jR))
        jaxis.append([float(v) for v in j["axis"]])
        lim = j["limits"] or dict(lower=-1e9, upper=1e9, effort=1e9, velocity=1e9)
        lower.append(lim["lower"]); upper.append(lim["upper"])
        effort.append(lim["effort"]); vel.append(lim["velocity"])
        jdamp.append(j["damping"]); jfric.append(j["friction"])
        jnames.append(j["name"])

    # Synthetic feet for URDFs whose calf collision is a mesh the extractor
    # can't sphere-ize (mini_cheetah: <collision><mesh .../> at the lower
    # link, no separate foot link). Place a foot sphere at the calf tip —
    # 2 × |inertial com z| below the knee (the lumped foot mass sits at the
    # tip) — plus 2 calf spheres along the shank for knee-contact sensing.
    if not any(s["label"] == "foot" for s in spheres):
        for lname, link in links.items():
            if classify(lname, foot_name) != "calf":
                continue
            bi, R, p = body_index_of(lname)
            tip_z = -2.0 * abs(link.com[2]) if abs(link.com[2]) > 1e-6 else -0.2
            foot_r = 0.015
            tip = R @ np.array([0.0, 0.0, tip_z + foot_r]) + p
            spheres.append(dict(body=int(bi), pos=[float(v) for v in tip],
                                radius=foot_r, label="foot",
                                leg=leg_of(lname), link=lname))
            for frac in (0.35, 0.7):
                mid = R @ np.array([0.0, 0.0, tip_z * frac]) + p
                spheres.append(dict(body=int(bi), pos=[float(v) for v in mid],
                                    radius=0.016, label="calf",
                                    leg=leg_of(lname), link=lname))
            sites[lname] = dict(body=int(bi), pos=[float(v) for v in tip])

    # order feet FR, FL, RR, RL to match URDF joint order convention
    foot_order = sorted(sites.keys(), key=lambda n: ["FR", "FL", "RR", "RL"].index(
        next(t for t in ("FR", "FL", "RR", "RL") if t in n)))

    spec = dict(
        name=root.get("name"),
        body_names=body_names,
        parent=parent_idx,
        joint_names=jnames,
        joint_pos=jpos,
        joint_quat=jquat,
        joint_axis=jaxis,
        joint_lower=lower,
        joint_upper=upper,
        effort_limit=effort,
        velocity_limit=vel,
        joint_damping=jdamp,
        joint_friction=jfric,
        mass=[float(v) for v in mass],
        com=[[float(x) for x in c] for c in com],
        inertia=[[[float(x) for x in row] for row in I] for I in inertia_com],
        collision_spheres=spheres,
        foot_sites=[dict(name=n, **sites[n]) for n in foot_order],
        total_mass=float(mass.sum()),
    )
    return spec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("urdf")
    ap.add_argument("out")
    ap.add_argument("--foot-name", default="foot")
    args = ap.parse_args()
    spec = extract(args.urdf, args.foot_name)
    with open(args.out, "w") as f:
        json.dump(spec, f, indent=1)
    print(f"{spec['name']}: {len(spec['body_names'])} bodies, "
          f"{len(spec['joint_names'])} joints, {len(spec['collision_spheres'])} spheres, "
          f"total mass {spec['total_mass']:.3f} kg -> {args.out}", file=sys.stderr)
