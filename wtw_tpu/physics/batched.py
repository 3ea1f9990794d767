"""Batched env-minor physics step — the TPU hot path.

Same math as `engine.physics_step` (the per-robot reference implementation,
kept for vmap/multi-embodiment use), restructured for how a TPU actually
executes it:

- **Env-minor layout**: every per-env quantity is a (B,)-trailing array (a
  "struct of arrays"). The vmapped engine makes XLA juggle
  (4096, 13, 6, 6)-shaped tensors whose tiny trailing dims force lane
  padding and relayout copies — the round-1 profile showed ~1.5 ms of pure
  `copy` ops per substep. Here every op is elementwise over the batch, which
  has exactly one layout.
- **Compile-time constant folding**: the robot model (masses, inertias,
  joint frames, sphere offsets) is baked into the trace via the `m`/`ad`
  folding helpers, so multiplications by 0/±1 vanish. Kinematic-tree
  sparsity (ancestor dof masks) becomes *codegen* sparsity for the tree
  algorithms and static 0/1 mask columns for the sphere-vectorized contact
  block.
- **CRBA over the static tree**: with static unrolling there are no
  scatters (the round-1 negative result), so the composite-rigid-body
  algorithm's lower FLOP count wins; composites stay in the compact
  (I_o, h=mc, m) parameterization (spatial inertia is linear in it).
- **Sphere/body-vectorized hot blocks**: per-sphere contact assembly and
  per-body inertias run on (P, batch)/(nb, batch) stacked arrays — the
  graph stays ~8k ops (vs 31k fully scalarized), keeping XLA/Mosaic compile
  times sane while the executed FLOPs stay batч-wide.
- The same codegen runs as plain XLA (CPU tests, fallback) or inside a
  single Pallas kernel (TPU): the Pallas wrapper reshapes each (…, B) array
  to (…, 8, 128) tiles and feeds the identical Python code.

Semantics parity with engine.physics_step is asserted by
tests/test_physics_batched.py. Reference behavior being replaced:
gym.simulate at go1_gym/envs/base/legged_robot.py:74-81.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robot import RobotModel
from .engine import EngineParams
from .heightfield import HeightField
from .state import ContactInfo, PhysicsState

# ---------------------------------------------------------------------------
# folding scalar helpers: operands are Python floats (compile-time consts),
# numpy arrays (static columns) or traced arrays. 0/±1 floats fold away.
# ---------------------------------------------------------------------------


def _isc(x):
    return isinstance(x, (int, float))


def m(a, b):
    """Multiply with constant folding."""
    if _isc(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if _isc(b):
            return a * b
        if a == -1.0:
            return -b
    if _isc(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
        if b == -1.0:
            return -a
    return a * b


def ad(*xs):
    """Sum with 0-folding."""
    consts = sum(x for x in xs if _isc(x))
    arrs = [x for x in xs if not _isc(x)]
    if not arrs:
        return consts
    tot = arrs[0]
    for x in arrs[1:]:
        tot = tot + x
    if consts != 0.0:
        tot = tot + consts
    return tot


def sb(a, b):
    return ad(a, m(-1.0, b))


def v_cross(a, b):
    return [sb(m(a[1], b[2]), m(a[2], b[1])),
            sb(m(a[2], b[0]), m(a[0], b[2])),
            sb(m(a[0], b[1]), m(a[1], b[0]))]


def v_dot(a, b):
    return ad(m(a[0], b[0]), m(a[1], b[1]), m(a[2], b[2]))


def v_add(a, b):
    return [ad(a[i], b[i]) for i in range(len(a))]


def v_sub(a, b):
    return [sb(a[i], b[i]) for i in range(len(a))]


def v_scale(s, a):
    return [m(s, a[i]) for i in range(len(a))]


def q_mul(a, b):
    """Hamilton product, xyzw lists (matches utils.quat.quat_mul)."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return [
        ad(m(aw, bx), m(ax, bw), m(ay, bz), m(-1.0, m(az, by))),
        ad(m(aw, by), m(-1.0, m(ax, bz)), m(ay, bw), m(az, bx)),
        ad(m(aw, bz), m(ax, by), m(-1.0, m(ay, bx)), m(az, bw)),
        ad(m(aw, bw), m(-1.0, m(ax, bx)), m(-1.0, m(ay, by)), m(-1.0, m(az, bz))),
    ]


def q_rot(q, v):
    """Rotate 3-list v by quat 4-list q (matches utils.quat.quat_rotate)."""
    xyz = q[:3]
    w = q[3]
    t = v_scale(2.0, v_cross(xyz, v))
    return v_add(v_add(v, v_scale(w, t)), v_cross(xyz, t))


def q_to_R(q):
    """3x3 rotation nested list from quat components."""
    x, y, z, w = q
    xx, yy, zz = m(x, x), m(y, y), m(z, z)
    xy, xz, yz = m(x, y), m(x, z), m(y, z)
    wx, wy, wz = m(w, x), m(w, y), m(w, z)
    return [
        [sb(1.0, m(2.0, ad(yy, zz))), m(2.0, sb(xy, wz)), m(2.0, ad(xz, wy))],
        [m(2.0, ad(xy, wz)), sb(1.0, m(2.0, ad(xx, zz))), m(2.0, sb(yz, wx))],
        [m(2.0, sb(xz, wy)), m(2.0, ad(yz, wx)), sb(1.0, m(2.0, ad(xx, yy)))],
    ]


def mat_vec(M, v):
    return [ad(*[m(M[i][j], v[j]) for j in range(3)]) for i in range(3)]


def mat_mul3(A, B):
    return [[ad(*[m(A[i][k], B[k][j]) for k in range(3)])
             for j in range(3)] for i in range(3)]


def mat_T(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def _col(vals, bnd):
    """Static per-row constant column, broadcastable against (R, *batch)."""
    a = np.asarray(vals, np.float32)
    if np.all(a == a.flat[0]):
        return float(a.flat[0])      # uniform -> foldable Python float
    return a.reshape(a.shape + (1,) * bnd)


def kconst(vals, batch_shape):
    """Like _col, but materialized with jnp ops (concat of scalar fills) at
    full batch width, so the result is legal inside a Pallas kernel (no
    captured array consts, no sublane+lane broadcasts — Mosaic lacks those).
    Run-length compressed: 0/1 masks and repeated values cost ~2-4 ops."""
    a = np.asarray(vals, np.float32).ravel()
    if np.all(a == a[0]):
        return float(a[0])
    runs = []
    start = 0
    for i in range(1, len(a) + 1):
        if i == len(a) or a[i] != a[start]:
            runs.append(jnp.full((i - start,) + batch_shape,
                                 float(a[start]), jnp.float32))
            start = i
    return jnp.concatenate(runs, axis=0)


# ---------------------------------------------------------------------------
# static robot description (numpy, baked into the generated code)
# ---------------------------------------------------------------------------


class _Static:
    """Concrete (numpy) copy of the RobotModel + EngineParams, used as
    compile-time constants by the codegen."""

    def __init__(self, model: RobotModel, params: EngineParams):
        g = lambda x: np.asarray(x)
        self.nb, self.nj, self.nv = model.nb, model.nj, model.nv
        self.parent = [int(p) for p in model.parent_static]
        self.joint_pos = g(model.joint_pos).tolist()
        self.joint_quat = g(model.joint_quat).tolist()
        self.joint_axis = g(model.joint_axis).tolist()
        self.joint_damping = g(model.joint_damping).tolist()
        self.mass = g(model.mass).tolist()
        self.com = g(model.com).tolist()
        self.inertia = g(model.inertia).tolist()
        self.sph_body = g(model.sph_body).tolist()
        self.sph_pos = g(model.sph_pos)
        self.sph_radius = g(model.sph_radius)
        self.sph_label = g(model.sph_label).tolist()
        self.sph_leg = g(model.sph_leg).tolist()
        self.feet_body = g(model.feet_body).tolist()
        self.feet_pos = g(model.feet_pos).tolist()
        self.fixed_base = bool(model.fixed_base)
        self.P = len(self.sph_body)
        anc = np.asarray(model.anc)
        self.anc = anc
        self.anc_dofs = [
            [d for d in range(self.nv) if anc[b, d] > 0.5]
            for b in range(self.nb)
        ]
        self.dt = float(params.dt)
        self.gravity = g(params.gravity).tolist()
        self.k_contact = float(params.contact_stiffness)
        self.c_contact = float(params.contact_damping)
        self.vel_eps = float(params.friction_vel_eps)
        self.v_maxdep = float(params.max_depenetration_velocity)
        self.armature = float(params.armature)
        self.dofs = list(range(6, self.nv)) if self.fixed_base \
            else list(range(self.nv))


# ---------------------------------------------------------------------------
# core stages (component lists; leaves broadcast over trailing batch dims)
# ---------------------------------------------------------------------------


def fk_core(st: _Static, base_pos, base_quat, joint_q):
    """FK over the static tree. Returns body_pos/body_quat lists (len nb of
    3/4-lists), anchors/axes (len nj of 3-lists). Mirrors engine.fk."""
    pos = [None] * st.nb
    quat = [None] * st.nb
    anchors = [None] * st.nj
    axes = [None] * st.nj
    pos[0] = base_pos
    quat[0] = base_quat
    for j in range(st.nj):
        child, p = j + 1, st.parent[j + 1]
        assert p < child, "extractor guarantees parents precede children"
        qp = quat[p]
        anchor = v_add(pos[p], q_rot(qp, st.joint_pos[j]))
        q_frame = q_mul(qp, st.joint_quat[j])
        half = m(0.5, joint_q[j])
        s, c = jnp.sin(half), jnp.cos(half)
        q_j = [m(st.joint_axis[j][0], s), m(st.joint_axis[j][1], s),
               m(st.joint_axis[j][2], s), c]
        quat[child] = q_mul(q_frame, q_j)
        axes[j] = q_rot(q_frame, st.joint_axis[j])
        pos[child] = anchor
        anchors[j] = anchor
    return pos, quat, anchors, axes


def _stack_bodies(comps_per_body, sel=None):
    """[body][k] (batch) lists -> [k] (n, *batch) stacked arrays.
    sel: optional static index list (e.g. sphere -> body)."""
    idx = sel if sel is not None else range(len(comps_per_body))
    ncomp = len(comps_per_body[0])
    return [jnp.stack([comps_per_body[b][k] for b in idx])
            for k in range(ncomp)]


def sphere_pos_core(st: _Static, body_pos, body_quat, in_kernel=False):
    """World positions of all collision spheres, sphere-vectorized.
    Returns xp = [x, y, z] each (P, *batch), plus per-body R (nested lists).
    in_kernel: materialize static sphere offsets with kconst (Pallas-legal)
    instead of captured numpy columns."""
    bnd = jnp.ndim(body_pos[0][0])
    R = [q_to_R(q) for q in body_quat]
    # stacked rotation entries and positions selected per sphere
    Rsel = [[jnp.stack([R[b][i][j] for b in st.sph_body])
             for j in range(3)] for i in range(3)]         # (P, *batch)
    psel = _stack_bodies(body_pos, st.sph_body)
    if in_kernel:
        bshape = jnp.shape(body_pos[0][0])
        off = [kconst(st.sph_pos[:, k], bshape) for k in range(3)]
    else:
        off = [_col(st.sph_pos[:, k], bnd) for k in range(3)]
    xp = [ad(psel[i], *[m(Rsel[i][j], off[j]) for j in range(3)])
          for i in range(3)]
    return xp, R


def _dof_S(st: _Static, base_pos, anchors, axes):
    """S[i] = (sw 3-list, sv 3-list) spatial axis per dof @ base_pos.
    Base dofs are constant unit axes (engine._dof_subspace)."""
    S = []
    for k in range(3):
        sw = [1.0 if i == k else 0.0 for i in range(3)]
        S.append((sw, [0.0, 0.0, 0.0]))
    for k in range(3):
        sv = [1.0 if i == k else 0.0 for i in range(3)]
        S.append(([0.0, 0.0, 0.0], sv))
    for j in range(st.nj):
        r = v_sub(anchors[j], base_pos)
        S.append((axes[j], v_cross(r, axes[j])))
    return S


def dynamics_core(st: _Static, I: Dict) -> Dict:
    """Everything after FK + heightfield gather: inertias, bias forces, mass
    matrix, contact assembly, implicit solve, integration, diagnostics.

    Input component lists (trailing dims = batch; (P, *batch) for sphere-
    stacked entries): base_pos(3) base_quat(4) joint_q(nj) u(nv) tau(nj)
    body_pos(nb×3) body_quat(nb×4) anchors(nj×3) axes(nj×3)
    xp(3 of (P,*b)) hc(4 of (P,*b)) du dv ((P,*b)) ceil_h((P,*b) or None)
    fric rest payload (batch) com_off(3) g_ext(3 or None)
    inv_hscale (const float)
    """
    nj, nv, P = st.nj, st.nv, st.P
    dt = st.dt
    base_pos = I["base_pos"]
    u = I["u"]
    batch_shape = jnp.shape(I["fric"])
    bnd = len(batch_shape)

    body_pos, body_quat = I["body_pos"], I["body_quat"]
    S = _dof_S(st, base_pos, I["anchors"], I["axes"])

    stk_v = lambda comps: jnp.stack(
        [jnp.broadcast_to(jnp.asarray(c, jnp.float32), batch_shape)
         for c in comps])

    # ---- body spatial velocities, dof-vectorized ----
    # V[b] = sum_i anc[b,i] S_i u_i  ->  (nb, *batch) per component via a
    # static (nb, nv) mask contraction (no scatters, one reduce per comp).
    # recursive propagation down the static tree: V[b] = V[parent] + S_j u_j
    V = [None] * st.nb
    V[0] = ([ad(*[m(S[i][0][k], u[i]) for i in range(6)]) for k in range(3)],
            [ad(*[m(S[i][1][k], u[i]) for i in range(6)]) for k in range(3)])
    for j in range(nj):
        child, p = j + 1, st.parent[j + 1]
        V[child] = (v_add(V[p][0], v_scale(u[6 + j], S[6 + j][0])),
                    v_add(V[p][1], v_scale(u[6 + j], S[6 + j][1])))
    V_s = ([stk_v([V[b][0][k] for b in range(st.nb)]) for k in range(3)]
           + [stk_v([V[b][1][k] for b in range(st.nb)]) for k in range(3)])

    # ---- compact spatial inertias (I_o, h=m*c, mass), body-vectorized ----
    bq_s = _stack_bodies(body_quat)            # 4 × (nb, *batch)
    bp_s = _stack_bodies(body_pos)             # 3 × (nb, *batch)
    R_s = q_to_R(bq_s)                         # 3x3 of (nb, *batch)
    com_c = [kconst([st.com[b][k] for b in range(st.nb)], batch_shape)
             for k in range(3)]
    crot = mat_vec(R_s, com_c)                 # R @ com (body-frame const)
    c_s = [sb(ad(bp_s[k], crot[k]), base_pos[k]) for k in range(3)]
    Ic = [[kconst([st.inertia[b][i][j] for b in range(st.nb)], batch_shape)
           for j in range(3)] for i in range(3)]
    Iw_s = mat_mul3(mat_mul3(R_s, Ic), mat_T(R_s))

    # per-body views + body-0 domain randomization (payload, com offset)
    R = [[[R_s[i][j][b] for j in range(3)] for i in range(3)]
         for b in range(st.nb)]
    mass = [st.mass[b] for b in range(st.nb)]
    mass[0] = ad(st.mass[0], I["payload"])
    Io, hvec = [], []
    for b in range(st.nb):
        c = [c_s[k][b] for k in range(3)]
        if b == 0:
            c = v_add(c, mat_vec(R[0], I["com_off"]))
        c2 = v_dot(c, c)
        I_o = [[ad(Iw_s[i][j][b],
                   m(mass[b], sb(m(c2, 1.0 if i == j else 0.0),
                                 m(c[i], c[j]))))
                for j in range(3)] for i in range(3)]
        Io.append(I_o)
        hvec.append(v_scale(mass[b], c))

    def I_apply(b, w, v):
        """[[Io, h~],[h~^T, mE]] @ [w; v] = [Io w + h x v; m v + w x h]."""
        top = v_add(mat_vec(Io[b], w), v_cross(hvec[b], v))
        bot = v_add(v_scale(mass[b], v), v_cross(w, hvec[b]))
        return top, bot

    # ---- bias forces: RNEA with gravity trick (engine lines 280-296) ----
    g = list(st.gravity)
    if I.get("g_ext") is not None:
        g = v_add(g, I["g_ext"])
    avp = [None] * st.nb
    avp[0] = ([0.0, 0.0, 0.0], [m(-1.0, g[0]), m(-1.0, g[1]), m(-1.0, g[2])])
    for j in range(nj):
        child, p = j + 1, st.parent[j + 1]
        qd_j = u[6 + j]
        sj = S[6 + j]
        sqd = (v_scale(qd_j, sj[0]), v_scale(qd_j, sj[1]))
        w, vo = V[child]
        cw = v_cross(w, sqd[0])
        cv = v_add(v_cross(w, sqd[1]), v_cross(vo, sqd[0]))
        avp[child] = (v_add(avp[p][0], cw), v_add(avp[p][1], cv))

    # body-vectorized f_b = I_sp avp + V ×f (I_sp V) over stacked (nb, ·)
    Io_s2 = [[stk_v([Io[b][i][j] for b in range(st.nb)]) for j in range(3)]
             for i in range(3)]
    h_s2 = [stk_v([hvec[b][k] for b in range(st.nb)]) for k in range(3)]
    m_s2 = stk_v(mass)
    avp_w = [stk_v([avp[b][0][k] for b in range(st.nb)]) for k in range(3)]
    avp_v = [stk_v([avp[b][1][k] for b in range(st.nb)]) for k in range(3)]
    Vw_b = [V_s[k] for k in range(3)]
    Vv_b = [V_s[3 + k] for k in range(3)]

    def I_apply_s(w, v):
        top = v_add(mat_vec(Io_s2, w), v_cross(h_s2, v))
        bot = v_add(v_scale(m_s2, v), v_cross(w, h_s2))
        return top, bot

    t1, f1 = I_apply_s(avp_w, avp_v)
    tV, fV = I_apply_s(Vw_b, Vv_b)
    t2 = v_add(v_cross(Vw_b, tV), v_cross(Vv_b, fV))
    f2 = v_cross(Vw_b, fV)
    fb_t = v_add(t1, t2)
    fb_f = v_add(f1, f2)
    f_acc = [([fb_t[k][b] for k in range(3)], [fb_f[k][b] for k in range(3)])
             for b in range(st.nb)]
    for b in range(st.nb - 1, 0, -1):  # fold into parents: subtree sums
        p = st.parent[b]
        f_acc[p] = (v_add(f_acc[p][0], f_acc[b][0]),
                    v_add(f_acc[p][1], f_acc[b][1]))
    C = [None] * nv
    for k in range(3):
        C[k] = f_acc[0][0][k]
        C[3 + k] = f_acc[0][1][k]
    for j in range(nj):
        sj = S[6 + j]
        sub = f_acc[j + 1]
        C[6 + j] = ad(v_dot(sj[0], sub[0]), v_dot(sj[1], sub[1]))

    # ---- mass matrix via CRBA (composite inertias, static tree) ----
    cIo = [[[Io[b][i][j] for j in range(3)] for i in range(3)]
           for b in range(st.nb)]
    ch = [list(hvec[b]) for b in range(st.nb)]
    cm = list(mass)
    for b in range(st.nb - 1, 0, -1):
        p = st.parent[b]
        cIo[p] = [[ad(cIo[p][i][j], cIo[b][i][j]) for j in range(3)]
                  for i in range(3)]
        ch[p] = v_add(ch[p], ch[b])
        cm[p] = ad(cm[p], cm[b])

    M = [[0.0] * nv for _ in range(nv)]
    for i in range(3):
        for j in range(3):
            M[i][j] = cIo[0][i][j]
    hx, hy, hz = ch[0]
    skew_h = [[0.0, m(-1.0, hz), hy], [hz, 0.0, m(-1.0, hx)],
              [m(-1.0, hy), hx, 0.0]]
    for i in range(3):
        for j in range(3):
            M[i][3 + j] = skew_h[i][j]
            M[3 + j][i] = skew_h[i][j]
    for i in range(3):
        M[3 + i][3 + i] = cm[0]
    for j in range(nj):
        b = j + 1
        sw, sv = S[6 + j]
        Fw = v_add(mat_vec(cIo[b], sw), v_cross(ch[b], sv))
        Fv = v_add(v_scale(cm[b], sv), v_cross(sw, ch[b]))
        for i in st.anc_dofs[b]:
            if i > 6 + j:
                continue
            val = ad(v_dot(S[i][0], Fw), v_dot(S[i][1], Fv))
            M[i][6 + j] = val
            M[6 + j][i] = val
        M[6 + j][6 + j] = ad(M[6 + j][6 + j], st.armature)

    # ---- contacts, sphere-vectorized over (P[, 2·P w/ ceiling], *batch) ----
    fric, rest = I["fric"], I["rest"]
    k_c = st.k_contact
    c_n_imp = ad(m(st.c_contact, sb(1.0, rest)), dt * k_c)   # (batch)
    inv_s = I["inv_hscale"]
    xp = I["xp"]

    # terrain height + analytic bilinear normal (heightfield.py:94-106)
    h00, h10, h01, h11 = I["hc"]
    du, dv = I["du"], I["dv"]
    one_du, one_dv = sb(1.0, du), sb(1.0, dv)
    h = ad(m(m(h00, one_du), one_dv), m(m(h10, du), one_dv),
           m(m(h01, one_du), dv), m(m(h11, du), dv))
    dhdx = m(ad(m(sb(h10, h00), one_dv), m(sb(h11, h01), dv)), inv_s)
    dhdy = m(ad(m(sb(h01, h00), one_du), m(sb(h11, h10), du)), inv_s)
    nn = ad(m(dhdx, dhdx), m(dhdy, dhdy), 1.0)
    # flat terrain folds dhdx=dhdy=0.0 -> the whole normal/tangent algebra
    # collapses to the vertical-contact special case at compile time
    inv_n = nn ** -0.5 if _isc(nn) else jax.lax.rsqrt(nn)
    radius = kconst(st.sph_radius, batch_shape)
    n_g = [m(m(-1.0, dhdx), inv_n), m(m(-1.0, dhdy), inv_n), inv_n]
    # penetration measured ALONG the surface normal, not vertically:
    # depth_perp = (h - z)*n_z + r. On flat ground (n_z == 1) this is the
    # plain vertical depth; on the near-vertical faces of parkour obstacles
    # it caps the elastic force at ~k*r instead of k*(face height) — the
    # PhysX-like "wall push" instead of a trampoline launch that flips the
    # robot (adjudicated in BASELINE.md round 5; PhysX measures depth along
    # the contact normal too)
    depth_g = ad(m(sb(xp[2], h), m(-1.0, inv_n)), radius)

    # sphere-stacked kinematics
    Vw_s = _stack_bodies([V[b][0] for b in range(st.nb)], st.sph_body)
    Vv_s = _stack_bodies([V[b][1] for b in range(st.nb)], st.sph_body)
    r_p = [sb(xp[k], base_pos[k]) for k in range(3)]
    vel = v_add(Vv_s, v_cross(Vw_s, r_p))

    if I.get("ceil_h") is not None:
        # ceiling contacts: same spheres, n = (0,0,-1), depth from overhead
        # underside (engine lines 238-248)
        bs = batch_shape
        cat = lambda a, b: jnp.concatenate(
            [jnp.broadcast_to(a, (P,) + bs), jnp.broadcast_to(b, (P,) + bs)])
        depth = cat(depth_g, sb(ad(xp[2], radius), I["ceil_h"]))
        n = [cat(n_g[0], 0.0), cat(n_g[1], 0.0), cat(n_g[2], -1.0)]
        vel = [cat(vel[k], vel[k]) for k in range(3)]
        r_p = [cat(r_p[k], r_p[k]) for k in range(3)]
        sph_body2 = st.sph_body * 2
        sph_label2 = st.sph_label * 2
        sph_leg2 = st.sph_leg * 2
        Pa = 2 * P
    else:
        depth, n = depth_g, n_g
        sph_body2, sph_label2, sph_leg2 = (st.sph_body, st.sph_label,
                                           st.sph_leg)
        Pa = P

    active = jnp.where(depth > 0.0, 1.0, 0.0)
    # max_depenetration_velocity (PhysX sim block, config.py:376): the
    # elastic (position-error) force may push a resting contact apart at no
    # more than v_maxdep, i.e. f_elastic <= c_n_imp * v_maxdep (the implicit
    # damper balances the push at that separation speed). Impact damping is
    # untouched — only deep-penetration catapults are clipped.
    f_cap = m(c_n_imp, st.v_maxdep)
    f_n0 = m(jnp.minimum(jnp.maximum(m(k_c, depth), 0.0), f_cap), active)
    vn = v_dot(vel, n)
    v_t = v_sub(vel, v_scale(vn, n))
    c_t_imp = m(m(fric, f_n0),
                jax.lax.rsqrt(ad(v_dot(v_t, v_t), st.vel_eps ** 2)))
    cn_eff = m(active, c_n_imp)
    coef = sb(cn_eff, c_t_imp)

    # Contact Jacobian rows J_i = mask_i (sv_i + sw_i × r_p), processed in
    # sphere CHUNKS: bounds live VMEM inside the Pallas kernel (the full
    # (nv, Pa, batch) stacks were a 15 MB liveness spike). The XLA path uses
    # one full-width chunk.
    chunk = I.get("chunk") or Pa
    spans = [(s0, min(s0 + chunk, Pa)) for s0 in range(0, Pa, chunk)]
    slc = lambda a, s0, s1: a[s0:s1] if not _isc(a) else a
    sum_p = lambda x: jnp.sum(x, axis=0) if not _isc(x) else x

    def build_J(s0, s1):
        """Per-dof J rows + normal projections for sphere span [s0, s1)."""
        rp_c = [slc(r_p[k], s0, s1) for k in range(3)]
        n_c = [slc(n[k], s0, s1) for k in range(3)]
        Jl, wl = [], []
        for i in range(nv):
            sw, sv = S[i]
            cr = v_cross(sw, rp_c)
            mk = kconst([st.anc[b, i] for b in sph_body2[s0:s1]],
                        batch_shape)
            Ji = [m(mk, ad(sv[k], cr[k])) for k in range(3)]
            Jl.append(Ji)
            wl.append(v_dot(Ji, n_c))
        return Jl, wl, n_c

    A_c_rows = [0.0] * nv                            # each (nv, *batch)
    rhs_c = [0.0] * nv
    for (s0, s1) in spans:
        Jl, wl, n_c = build_J(s0, s1)
        coef_c = slc(coef, s0, s1)
        ct_c = slc(c_t_imp, s0, s1)
        f0_c = slc(f_n0, s0, s1)
        cshape = (s1 - s0,) + batch_shape
        stk_c = lambda comps: jnp.stack(
            [jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape)
             for c in comps])
        W = stk_c(wl)                                # (nv, C, *batch)
        JX, JY, JZ = (stk_c([Jl[i][k] for i in range(nv)])
                      for k in range(3))
        for i in range(nv):
            contrib = ad(m(m(coef_c, wl[i]), W),
                         m(ct_c, ad(m(Jl[i][0], JX), m(Jl[i][1], JY),
                                    m(Jl[i][2], JZ))))
            if not _isc(contrib):
                A_c_rows[i] = ad(A_c_rows[i], jnp.sum(contrib, axis=1))
            rhs_c[i] = ad(rhs_c[i], sum_p(m(wl[i], f0_c)))

    # ---- assemble A columns, rhs; column-major unrolled Cholesky ----
    D = [0.0] * 6 + list(st.joint_damping)
    tau_full = [0.0] * 6 + list(I["tau"])
    dofs = st.dofs
    nd = len(dofs)
    lo = dofs[0]
    Acols = []                                       # each (nd, *batch)
    for jj in dofs:
        mcol = stk_v([ad(M[i][jj], dt * D[i] if i == jj else 0.0)
                      for i in dofs])
        acol = A_c_rows[jj][lo:] if lo else A_c_rows[jj]
        Acols.append(mcol + dt * acol)
    rhs_l = [ad(*([m(M[i][j], u[j]) for j in range(nv)]
                  + [m(dt, sb(tau_full[i], C[i])), m(dt, rhs_c[i])]))
             for i in dofs]

    # right-looking Cholesky on columns; diagonal stored inverted so every
    # divide becomes a multiply (linalg.cholesky_solve, env-minor form)
    gt = [kconst([1.0 if i2 > kk else 0.0 for i2 in range(nd)], batch_shape)
          for kk in range(nd)]
    Lcols, dinvs = [], []
    for kk in range(nd):
        ck = Acols[kk]
        dinv = jax.lax.rsqrt(ck[kk])
        lcol = ck * dinv * gt[kk]                    # strictly-lower entries
        for j2 in range(kk + 1, nd):
            Acols[j2] = Acols[j2] - lcol[j2] * lcol
        Lcols.append(lcol)
        dinvs.append(dinv)
    y = []
    for kk in range(nd):
        acc = ad(rhs_l[kk],
                 *[m(-1.0, m(Lcols[j2][kk], y[j2])) for j2 in range(kk)])
        y.append(m(acc, dinvs[kk]))
    x = [None] * nd
    for kk in range(nd - 1, -1, -1):
        acc = ad(y[kk], *[m(-1.0, m(Lcols[kk][j2], x[j2]))
                          for j2 in range(kk + 1, nd)])
        x[kk] = m(acc, dinvs[kk])
    u_new = [0.0] * nv
    for off, i in enumerate(dofs):
        u_new[i] = x[off]

    # ---- realized contact forces (diagnostics), chunked like A_c ----
    groups = ([("foot", 4, l) for l in range(4)]
              + [("thigh", 2, l) for l in range(4)]
              + [("calf", 3, l) for l in range(4)]
              + [("base", 0, None)])
    g_acc = {gk: [0.0, 0.0, 0.0] for gk in range(len(groups))}
    total_fn = 0.0
    for (s0, s1) in spans:
        Jl, wl, n_c = build_J(s0, s1)
        f0_c = slc(f_n0, s0, s1)
        cne_c = slc(cn_eff, s0, s1)
        ct_c = slc(c_t_imp, s0, s1)
        cv_new = [ad(*[m(Jl[i][kx], u_new[i]) for i in range(nv)])
                  for kx in range(3)]
        vn_new = v_dot(cv_new, n_c)
        vt_new = v_sub(cv_new, v_scale(vn_new, n_c))
        fn_lin = sb(f0_c, m(cne_c, vn_new))
        c_force = v_sub(v_scale(fn_lin, n_c), v_scale(ct_c, vt_new))
        total_fn = ad(total_fn, sum_p(jnp.maximum(fn_lin, 0.0)))
        for gk, (_, lbl, leg) in enumerate(groups):
            mk = kconst(
                [1.0 if (sph_label2[p] == lbl
                         and (leg is None or sph_leg2[p] == leg)) else 0.0
                 for p in range(s0, s1)], batch_shape)
            g_acc[gk] = [ad(g_acc[gk][k], sum_p(m(mk, c_force[k])))
                         for k in range(3)]

    def norm3(v):
        return jnp.sqrt(ad(m(v[0], v[0]), m(v[1], v[1]), m(v[2], v[2]),
                           1e-30))

    foot_forces = [g_acc[l] for l in range(4)]
    thigh_contact = [norm3(g_acc[4 + l]) for l in range(4)]
    calf_contact = [norm3(g_acc[8 + l]) for l in range(4)]
    base_contact = norm3(g_acc[12])

    # ---- integrate (semi-implicit Euler; engine lines 336-353) ----
    w_new = u_new[0:3]
    v_sp = u_new[3:6]
    qd_new = u_new[6:]
    dpos = v_scale(dt, v_sp)
    base_pos_new = v_add(base_pos, dpos)
    v_new = v_add(v_sp, v_cross(w_new, dpos))
    theta = jnp.sqrt(ad(m(w_new[0], w_new[0]), m(w_new[1], w_new[1]),
                        m(w_new[2], w_new[2]), 1e-30))
    half = m(0.5 * dt, theta)
    kfac = jnp.where(theta > 1e-9, jnp.sin(half) / jnp.maximum(theta, 1e-9),
                     0.5 * dt)
    dq = [m(w_new[0], kfac), m(w_new[1], kfac), m(w_new[2], kfac),
          jnp.cos(half)]
    qn = q_mul(dq, I["base_quat"])
    inv_qn = jax.lax.rsqrt(ad(*[m(qn[i], qn[i]) for i in range(4)]))
    base_quat_new = [m(qn[i], inv_qn) for i in range(4)]
    joint_q_new = [ad(I["joint_q"][j], m(dt, qd_new[j])) for j in range(nj)]

    # ---- foot kinematics (engine lines 360-364) ----
    foot_positions, foot_velocities = [], []
    for l in range(4):
        fb = st.feet_body[l]
        fpos = v_add(body_pos[fb], mat_vec(R[fb], st.feet_pos[l]))
        w_b, v_b = V[fb]
        fvel = v_add(v_b, v_cross(w_b, v_sub(fpos, base_pos)))
        foot_positions.append(fpos)
        foot_velocities.append(fvel)

    if I.get("debug"):
        return dict(M=M, C=C, A_c_rows=A_c_rows, rhs_c=rhs_c, rhs_l=rhs_l,
                    u_new=u_new, V=V)
    return dict(
        base_pos=base_pos_new, base_quat=base_quat_new,
        base_lin_vel=v_new, base_ang_vel=w_new,
        joint_q=joint_q_new, joint_qd=list(qd_new),
        foot_forces=foot_forces, foot_positions=foot_positions,
        foot_velocities=foot_velocities,
        thigh_contact=thigh_contact, calf_contact=calf_contact,
        base_contact=base_contact, total_normal_force=total_fn,
    )


# ---------------------------------------------------------------------------
# heightfield row gather (XLA; gathers stay outside the Pallas kernel)
# ---------------------------------------------------------------------------


def _hf_uv(hf: HeightField, x, y):
    """Clipped continuous cell coordinates (same clamp as the gather)."""
    H, W = hf.heights.shape
    u = jnp.clip((x - hf.origin[0]) / hf.horizontal_scale, 0.0, H - 1.001)
    v = jnp.clip((y - hf.origin[1]) / hf.horizontal_scale, 0.0, W - 1.001)
    return u, v


def _hf_gather(hf: HeightField, x, y):
    """x/y: (P, B) sphere xy -> (u0f, v0f, [h00,h10,h01,h11]) with u0f/v0f
    the f32 cell coordinates the corners were gathered at (cache anchor)."""
    u, v = _hf_uv(hf, x, y)
    u0f, v0f = jnp.floor(u), jnp.floor(v)
    W = hf.heights.shape[1]
    base = u0f.astype(jnp.int32) * W + v0f.astype(jnp.int32)
    hc = jnp.take(hf.corners, base, axis=0)          # (P, B, 4)
    return u0f, v0f, [hc[..., 0], hc[..., 1], hc[..., 2], hc[..., 3]]


def _hf_rows(hf: HeightField, x, y, cached=None):
    """Corner rows + in-cell offsets for the dynamics kernel.

    Three regimes, cheapest first:
    - constant grid (hf.is_flat): Python-float constants — folded into the
      kernel, no gather, no memory traffic;
    - `cached` = (u0f, v0f, hc) from hf_gather_cache: reuse the corner rows
      gathered at the policy-step start and recompute du/dv against the
      cached cell, CLAMPED to [0, 1] — a sphere that crosses a cell edge
      mid-policy-step is evaluated at the cached patch's edge (exact at
      the crossing point by C0 continuity) instead of extrapolating the
      patch, which near terrain discontinuities (hurdle/gap edges, where
      adjacent-cell slope deltas are large) could otherwise err by
      several cm right where the contact solver is most fragile;
    - full per-substep row gather (exact).
    """
    if hf.is_flat:
        h0 = hf.flat_value
        return [h0, h0, h0, h0], 0.0, 0.0
    if cached is not None:
        u0f, v0f, hc = cached
        u, v = _hf_uv(hf, x, y)
        return hc, jnp.clip(u - u0f, 0.0, 1.0), jnp.clip(v - v0f, 0.0, 1.0)
    u0f, v0f, hc = _hf_gather(hf, x, y)
    u, v = _hf_uv(hf, x, y)
    return hc, u - u0f, v - v0f


def _hf_height(hf: HeightField, x, y, cached=None):
    """Bilinear heights only (ceiling query): (P, B) -> (P, B)."""
    hc, du, dv = _hf_rows(hf, x, y, cached=cached)
    h00, h10, h01, h11 = hc
    if hf.is_flat:
        return h00
    return (h00 * (1 - du) * (1 - dv) + h10 * du * (1 - dv)
            + h01 * (1 - du) * dv + h11 * du * dv)


def hf_gather_cache(hf: HeightField, xp_g,
                    hf_ceiling: Optional[HeightField] = None):
    """Gather terrain (and ceiling) corner rows ONCE at the current sphere
    positions, for reuse across the decimation substeps of one policy step
    via physics_step_batched(hf_cache=...). Flat grids need no cache."""
    cache = {}
    if not hf.is_flat:
        cache["g"] = _hf_gather(hf, xp_g[0], xp_g[1])
    if hf_ceiling is not None and not hf_ceiling.is_flat:
        cache["c"] = _hf_gather(hf_ceiling, xp_g[0], xp_g[1])
    return cache


# ---------------------------------------------------------------------------
# Pallas wrapper for dynamics_core
# ---------------------------------------------------------------------------

_LANE = 128
_SUB = 8
_BLOCK = _LANE * _SUB


class _Pre:
    """Placeholder leaf referencing row `row` of a PRE-PACKED operand group
    (an array already in the kernel's (n, *lead, SUB, LANE) tile layout,
    e.g. the FK kernel's outputs) — consumed in-layout by the dynamics
    kernel with no XLA-side unpack/repack round trip."""

    __slots__ = ("group", "row")

    def __init__(self, group, row):
        self.group = group
        self.row = row


def _flatten_tree(nested):
    """Flatten nested dict/list structures into (array_leaves, rebuild_fn).
    Python scalars, numpy arrays (static consts) and None are captured as
    compile-time constants. _Pre leaves resolve against the `pre` dict
    passed to rebuild (group name -> indexable of rows)."""
    leaves = []

    def walk(x):
        if isinstance(x, dict):
            return ("d", [(k, walk(x[k])) for k in sorted(x)])
        if isinstance(x, (list, tuple)):
            return ("l", [walk(e) for e in x])
        if isinstance(x, _Pre):
            return ("p", (x.group, x.row))
        if x is None or _isc(x) or isinstance(x, np.ndarray):
            return ("c", x)
        leaves.append(x)
        return ("i", len(leaves) - 1)

    spec = walk(nested)

    def rebuild(vals, node=None, pre=None):
        kind, v = spec if node is None else node
        if kind == "d":
            return {k: rebuild(vals, e, pre) for k, e in v}
        if kind == "l":
            return [rebuild(vals, e, pre) for e in v]
        if kind == "p":
            return pre[v[0]][v[1]]
        return v if kind == "c" else vals[v]

    return leaves, rebuild


def _fk_b_rows(st: _Static, body_pos, body_quat, anchors, axes):
    """Canonical flattening of the FK kernel's (B,)-lead outputs; must stay
    in lockstep with _fk_pre_tree."""
    rows = [body_pos[b][k] for b in range(st.nb) for k in range(3)]
    rows += [body_quat[b][k] for b in range(st.nb) for k in range(4)]
    rows += [anchors[j][k] for j in range(st.nj) for k in range(3)]
    rows += [axes[j][k] for j in range(st.nj) for k in range(3)]
    return rows


def _fk_pre_tree(st: _Static):
    """_Pre placeholder trees addressing _fk_b_rows'/xp's packed layout."""
    import itertools
    c = itertools.count()
    nxt = lambda: _Pre("fk_b", next(c))
    body_pos = [[nxt() for _ in range(3)] for _ in range(st.nb)]
    body_quat = [[nxt() for _ in range(4)] for _ in range(st.nb)]
    anchors = [[nxt() for _ in range(3)] for _ in range(st.nj)]
    axes = [[nxt() for _ in range(3)] for _ in range(st.nj)]
    xp = [_Pre("fk_p", k) for k in range(3)]
    return body_pos, body_quat, anchors, axes, xp


def _pack_rows(arrs, B: int, Bp: int):
    """Stack (B,) arrays into the (n, G*SUB, LANE) tile layout."""
    a = jnp.stack([jnp.broadcast_to(jnp.asarray(x, jnp.float32), (B,))
                   for x in arrs])
    if Bp != B:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], Bp - B))], axis=-1)
    return a.reshape(a.shape[0], (Bp // _BLOCK) * _SUB, _LANE)


def _pallas_fk(st: _Static, base_pos, base_quat, joint_q, B: int):
    """Kernel A of the two-kernel substep: FK + sphere world positions,
    written directly in kernel B's packed tile layout (fk_b: (B,)-lead rows,
    fk_p: the (P,)-lead xp rows). Replaces the ~160-leaf XLA elementwise FK
    chain + per-leaf stack that dominated the substep's non-kernel time."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp = ((B + _BLOCK - 1) // _BLOCK) * _BLOCK
    G = Bp // _BLOCK
    rows = list(base_pos) + list(base_quat) + list(joint_q)
    packed = _pack_rows(rows, B, Bp)
    n_in = len(rows)                       # 3 + 4 + nj
    n_b = st.nb * 7 + st.nj * 6

    def kernel(in_ref, out_b, out_p):
        vals = [in_ref[i] for i in range(n_in)]
        bp, bq, jq = vals[0:3], vals[3:7], vals[7:]
        body_pos, body_quat, anchors, axes = fk_core(st, bp, bq, jq)
        xp, _ = sphere_pos_core(st, body_pos, body_quat, in_kernel=True)
        for i, v in enumerate(_fk_b_rows(st, body_pos, body_quat,
                                         anchors, axes)):
            out_b[i] = jnp.broadcast_to(v, (_SUB, _LANE))
        for k in range(3):
            out_p[k] = jnp.broadcast_to(xp[k], (st.P, _SUB, _LANE))

    fkb, fkp = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((n_in, _SUB, _LANE), lambda g: (0, g, 0))],
        out_specs=[
            pl.BlockSpec((n_b, _SUB, _LANE), lambda g: (0, g, 0)),
            pl.BlockSpec((3, st.P, _SUB, _LANE), lambda g: (0, 0, g, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((n_b, G * _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, st.P, G * _SUB, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(packed)
    xp_flat = fkp.reshape(3, st.P, Bp)[..., :B]      # for the hf gather
    return fkb, fkp, [xp_flat[k] for k in range(3)]


def _pallas_dynamics(st: _Static, inputs: Dict, B: int,
                     pre: Optional[Dict[str, jnp.ndarray]] = None):
    """Run dynamics_core inside one Pallas kernel, env tiled (8, 128).

    Leaves are grouped by leading ("row") shape — (B,) state rows and
    (P, B) sphere rows — and packed into one stacked operand per group, so
    the kernel has a handful of refs instead of hundreds."""
    from jax.experimental import pallas as pl

    Bp = ((B + _BLOCK - 1) // _BLOCK) * _BLOCK
    G = Bp // _BLOCK

    inputs = dict(inputs, chunk=8)   # bound per-chunk VMEM liveness
    in_leaves, rebuild_in = _flatten_tree(inputs)
    n_in = len(in_leaves)

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x, x.shape[:-1] + (B,))

    prepped = [prep(x) for x in in_leaves]
    lead_shapes = sorted({p.shape[:-1] for p in prepped})
    buckets = {ls: [] for ls in lead_shapes}
    leaf_slot = []                       # leaf i -> (lead_shape, row)
    for p in prepped:
        ls = p.shape[:-1]
        leaf_slot.append((ls, len(buckets[ls])))
        buckets[ls].append(p)

    def pack(arrs, ls):
        # stack first, pad the batch dim ONCE per bucket (padding per leaf
        # bloats the graph by ~2 ops x 230 leaves -> pathological compiles)
        a = jnp.stack(arrs)              # (n, *ls, B)
        if Bp != B:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[..., -1:], a.shape[:-1] + (Bp - B,))],
                axis=-1)
        return a.reshape((len(arrs),) + ls + (G * _SUB, _LANE))

    packed = {ls: pack(buckets[ls], ls) for ls in lead_shapes}
    # packed[ls]: (n, *ls, G*SUB, LANE)

    pre = pre or {}
    pre_names = sorted(pre)
    # pre[g]: (n, *lead, G*SUB, LANE) already in tile layout
    pre_leads = {g: pre[g].shape[1:-2] for g in pre_names}

    # discover output structure abstractly (no eager work at trace time)
    probe_spec = {}

    def _probe(vals, pre_vals):
        out = dynamics_core(st, rebuild_in(vals, pre=pre_vals))
        leaves, rebuild = _flatten_tree(out)
        probe_spec["rebuild"] = rebuild
        probe_spec["n"] = len(leaves)
        return leaves

    jax.eval_shape(
        _probe,
        [jax.ShapeDtypeStruct(p.shape[:-1] + (1, 1), jnp.float32)
         for p in prepped],
        {g: [jax.ShapeDtypeStruct(pre_leads[g] + (1, 1), jnp.float32)
             for _ in range(pre[g].shape[0])] for g in pre_names})
    out_rebuild_fn = probe_spec["rebuild"]
    n_out = probe_spec["n"]

    n_bkt = len(lead_shapes)

    def kernel(*refs):
        in_refs = dict(zip(lead_shapes, refs[:n_bkt]))
        pre_refs = dict(zip(pre_names, refs[n_bkt:-1]))
        out_ref = refs[-1]
        vals = [in_refs[ls][row] for ls, row in leaf_slot]  # (*ls, SUB, LANE)
        I = rebuild_in(vals, pre=pre_refs)
        out = dynamics_core(st, I)
        leaves, _ = _flatten_tree(out)
        assert len(leaves) == n_out
        for i, v in enumerate(leaves):
            out_ref[i] = jnp.broadcast_to(v, (_SUB, _LANE))

    in_specs = []
    ops = []
    for ls in lead_shapes:
        nrows = packed[ls].shape[0]
        blk = (nrows,) + ls + (_SUB, _LANE)
        nlead = 1 + len(ls)
        in_specs.append(pl.BlockSpec(
            blk, lambda g, _n=nlead: (0,) * _n + (g, 0)))
        ops.append(packed[ls])
    for g_name in pre_names:
        ls = pre_leads[g_name]
        blk = (pre[g_name].shape[0],) + ls + (_SUB, _LANE)
        nlead = 1 + len(ls)
        in_specs.append(pl.BlockSpec(
            blk, lambda g, _n=nlead: (0,) * _n + (g, 0)))
        ops.append(pre[g_name])

    from jax.experimental.pallas import tpu as pltpu
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, _SUB, _LANE), lambda g: (0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out, G * _SUB, _LANE),
                                       jnp.float32),
        # the ceiling path doubles the contact set (Pa=2P); its live set
        # peaks ~21 MB — above the 16 MB default scoped-vmem budget, well
        # under the chip's VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*ops)

    outs = [out[i].reshape(Bp)[:B] for i in range(n_out)]
    return out_rebuild_fn(outs)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def physics_step_batched(model: RobotModel, hf: HeightField,
                         params: EngineParams, state: PhysicsState,
                         joint_torque, friction, restitution,
                         payload_mass=None, com_offset=None,
                         external_accel=None,
                         hf_ceiling: Optional[HeightField] = None,
                         backend: str = "auto",
                         hf_cache=None, return_hf_cache: bool = False):
    """Batched drop-in for `vmap(physics_step)`: state fields carry a
    leading (B,) env axis; returns (PhysicsState, ContactInfo) with the same
    batch axis. backend: 'auto' | 'xla' | 'pallas'.

    hf_cache: corner-row cache from hf_gather_cache (or a previous call
    with return_hf_cache=True) — reuses the policy-step-start terrain rows
    instead of re-gathering per decimation substep (the gather was ~14% of
    MoB device step time). return_hf_cache: additionally return the cache
    gathered at THIS call's sphere positions as a third output."""
    st = _Static(model, params)
    B = state.joint_q.shape[0]
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    cols = lambda a: [a[:, i] for i in range(a.shape[1])]
    base_pos = cols(state.base_pos)
    base_quat = cols(state.base_quat)
    joint_q = cols(state.joint_q)
    u = (cols(state.base_ang_vel) + cols(state.base_lin_vel)
         + cols(state.joint_qd))
    tau = cols(joint_torque)

    pre = None
    if backend == "pallas":
        # kernel A: FK + sphere positions, emitted pre-packed for kernel B;
        # only the sphere xy positions surface to XLA (for the hf gather)
        fkb, fkp, xp_g = _pallas_fk(st, base_pos, base_quat, joint_q, B)
        pre = {"fk_b": fkb, "fk_p": fkp}
        body_pos, body_quat, anchors, axes, xp = _fk_pre_tree(st)
    else:
        # XLA: pure (B,) elementwise chains, 1-D layouts
        body_pos, body_quat, anchors, axes = fk_core(st, base_pos, base_quat,
                                                     joint_q)
        xp, _R = sphere_pos_core(st, body_pos, body_quat)
        xp_g = xp

    cache = hf_cache or {}
    hc, du, dv = _hf_rows(hf, xp_g[0], xp_g[1], cached=cache.get("g"))
    ceil_h = None
    if hf_ceiling is not None:
        ceil_h = _hf_height(hf_ceiling, xp_g[0], xp_g[1],
                            cached=cache.get("c"))

    zero = jnp.zeros((B,), jnp.float32)
    g_ext = None
    if external_accel is not None:
        ea = jnp.asarray(external_accel)
        g_ext = [ea[0], ea[1], ea[2]] if ea.ndim == 1 else cols(ea)
    payload = zero if payload_mass is None else jnp.broadcast_to(
        jnp.asarray(payload_mass, jnp.float32), (B,))
    com_off = ([zero, zero, zero] if com_offset is None
               else cols(jnp.broadcast_to(jnp.asarray(com_offset), (B, 3))))

    inputs = dict(
        base_pos=base_pos, base_quat=base_quat, joint_q=joint_q, u=u,
        tau=tau, body_pos=body_pos, body_quat=body_quat, anchors=anchors,
        axes=axes, xp=xp, hc=hc, du=du, dv=dv,
        inv_hscale=float(1.0 / np.asarray(hf.horizontal_scale)),
        ceil_h=ceil_h,
        fric=jnp.broadcast_to(jnp.asarray(friction, jnp.float32), (B,)),
        rest=jnp.broadcast_to(jnp.asarray(restitution, jnp.float32), (B,)),
        payload=payload, com_off=com_off, g_ext=g_ext,
    )

    if backend == "pallas":
        out = _pallas_dynamics(st, inputs, B, pre=pre)
    else:
        out = dynamics_core(st, inputs)

    stk = lambda comp: jnp.stack(
        [jnp.broadcast_to(c, (B,)) for c in comp], axis=-1)
    stk2 = lambda rows: jnp.stack([stk(r) for r in rows], axis=1)

    new_state = PhysicsState(
        base_pos=stk(out["base_pos"]), base_quat=stk(out["base_quat"]),
        base_lin_vel=stk(out["base_lin_vel"]),
        base_ang_vel=stk(out["base_ang_vel"]),
        joint_q=stk(out["joint_q"]), joint_qd=stk(out["joint_qd"]))
    info = ContactInfo(
        foot_forces=stk2(out["foot_forces"]),
        foot_positions=stk2(out["foot_positions"]),
        foot_velocities=stk2(out["foot_velocities"]),
        thigh_contact=stk(out["thigh_contact"]),
        calf_contact=stk(out["calf_contact"]),
        base_contact=jnp.broadcast_to(out["base_contact"], (B,)),
        total_normal_force=jnp.broadcast_to(out["total_normal_force"], (B,)))
    if return_hf_cache:
        # the uncached path's own gather is identical — XLA CSE merges them
        return new_state, info, hf_gather_cache(hf, xp_g, hf_ceiling)
    return new_state, info
