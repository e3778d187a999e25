"""Independent numpy path-tracer oracle for golden tests.

A from-scratch vectorised-numpy implementation of the reference semantics
(kernel.cu shade/extend/connect + sunsky.cu), deliberately structured
differently from tyrant_tpu.render (per-path bounce loop instead of a
wavefront; numpy Generator RNG instead of xorshift) so shared bugs are
unlikely.  Comparisons are Monte-Carlo-tolerance only (SURVEY.md §7 hard
part 3: match distributions, not streams).
"""

from __future__ import annotations

import math

import numpy as np

PI = math.pi
INV_PI = 1.0 / PI
EPS = 1e-3
VERY_FAR = 1e20
MAX_BOUNCES = 5
DIFF, SPEC, REFR, PHONG, LIGHT, GGX, FOG = 0, 1, 2, 3, 4, 5, 6

# --- sky model (numpy rewrite of sunsky.cu) ---
K = np.array([0.686, 0.678, 0.666])
UP = np.array([0.0, 0.0, 1.0])
RAYLEIGH = np.array([5.176821e-6, 1.2785348e-5, 2.8530756e-5])
WAVELENGTHS = np.array([680e-9, 550e-9, 450e-9])
SUN_SIZE_DEG = 1.5
SUN_ANGULAR_COS = math.cos(SUN_SIZE_DEG * PI / 180.0)
CUTOFF = PI / 1.95
STEEPNESS = 1.5
TURBIDITY = 1.0
MIE_COEFF = 0.005
MIE_G = 0.80
V_JUNGE = 4.0
RZL, MZL = 8.4e3, 1.25e3
SUN_INTENSITY = 1000.0
SKY_FACTOR = 1.0


def total_mie():
    c = 0.2 * TURBIDITY * 10e-18
    return 0.434 * c * PI * (2 * PI / WAVELENGTHS) ** (V_JUNGE - 2.0) * K * MIE_COEFF


def _sky_common(view, sun_dir):
    view = np.atleast_2d(view)
    cvs = view @ sun_dir
    csu = float(sun_dir @ UP)
    cuv = view @ UP
    sun_e = SUN_INTENSITY * max(
        0.0, 1.0 - math.exp(-((CUTOFF - math.acos(np.clip(csu, -1, 1))) / STEEPNESS)))
    mie = total_mie()
    with np.errstate(divide="ignore", invalid="ignore"):
        zen = np.maximum(0.0, cuv)
        rl = RZL / zen[:, None]
        ml = MZL / zen[:, None]
        fex = np.exp(-(RAYLEIGH * rl + mie * ml))
    fex = np.nan_to_num(fex, nan=0.0, posinf=0.0)
    r_phase = (3.0 / (16 * PI)) * (1 + cvs**2)
    hg = (1.0 / (4 * PI)) * ((1 - MIE_G**2)
                             / (1 - 2 * MIE_G * cvs + MIE_G**2) ** 1.5)
    frac = (RAYLEIGH * r_phase[:, None] + mie * hg[:, None]) / (RAYLEIGH + mie)
    something = sun_e * frac
    sky_t = something * (1 - fex)
    mix_t = np.clip((1 - csu) ** 5, 0, 1)
    sky_t = sky_t * ((1 - mix_t) + mix_t * np.sqrt(np.maximum(something * fex, 0)))
    return sun_e, fex, sky_t, cvs


def sky_np(view, sun_dir):
    _, _, sky_t, _ = _sky_common(view, sun_dir)
    return SKY_FACTOR * 0.01 * sky_t


def sun_np(view, sun_dir):
    sun_e, fex, _, cvs = _sky_common(view, sun_dir)
    disc = (cvs >= SUN_ANGULAR_COS).astype(float)
    return 0.01 * sun_e * 19000.0 * fex * disc[:, None]


def sunsky_np(view, sun_dir):
    sun_e, fex, sky_t, cvs = _sky_common(view, sun_dir)
    t = np.clip((cvs - SUN_ANGULAR_COS) / 2e-5, 0, 1)
    disc = t * t * (3 - 2 * t)
    return 0.01 * (sun_e * 19000.0 * fex * disc[:, None] * 1e-5 + sky_t)


def norm(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def sphere_hit(o, d, c, r):
    """Nearest sphere-quadratic root > EPS else far root else 0."""
    op = c - o
    b = np.sum(op * d, -1)
    disc = b * b - np.sum(op * op, -1) + r * r
    sq = np.sqrt(np.maximum(disc, 0))
    t1, t2 = b - sq, b + sq
    t = np.where(t1 > EPS, t1, np.where(t2 > EPS, t2, 0.0))
    return np.where(disc < 0, 0.0, t)


def tri_hit(o, d, v0, e1, e2):
    """Möller-Trumbore, backface-culled, [N,T]."""
    pvec = np.cross(d[:, None, :], e2[None])
    det = np.sum(e1[None] * pvec, -1)
    inv = 1.0 / np.where(np.abs(det) < 1e-30, 1.0, det)
    tvec = o[:, None, :] - v0[None]
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1[None])
    v = np.sum(d[:, None, :] * qvec, -1) * inv
    t = np.sum(e2[None] * qvec, -1) * inv
    ok = (det >= 1e-7) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    return np.where(ok, t, 0.0)


class OracleScene:
    def __init__(self, spheres, tris=None, light_index=6, roughness=None):
        # spheres: list of (radius, center, color, emission, refl)
        self.radius = np.array([s[0] for s in spheres], float)
        self.center = np.array([s[1] for s in spheres], float)
        self.color = np.array([s[2] for s in spheres], float)
        self.emission = np.array([s[3] for s in spheres], float)
        self.refl = np.array([s[4] for s in spheres], int)
        # GGX perceptual roughness per sphere (same clamp as
        # Scene.to_device)
        self.rough = np.clip(
            np.full(len(spheres), 0.3) if roughness is None
            else np.asarray(roughness, float), 0.03, 1.0)
        if tris is None:
            self.tv = np.zeros((0, 3))
            self.te1 = np.zeros((0, 3))
            self.te2 = np.zeros((0, 3))
        else:
            self.tv, self.te1, self.te2 = (np.asarray(a, float) for a in tris)
        self.light_index = light_index
        # all emissive spheres (multi-light NEE); default matches the
        # single hard-coded light
        self.light_indices = [i for i in range(len(spheres))
                              if self.refl[i] == 4]  # LIGHT
        if not self.light_indices:
            self.light_indices = [light_index]

    def intersect(self, o, d):
        """closest hit: returns (t, kind, idx, normal_at?) kind 0=sphere 1=tri"""
        n = o.shape[0]
        t = np.full(n, VERY_FAR)
        kind = np.full(n, -1)
        idx = np.full(n, -1)
        for i in range(len(self.radius)):
            ti = sphere_hit(o, d, self.center[i], self.radius[i])
            m = (ti > 0) & (ti < t)
            t[m] = ti[m]; kind[m] = 0; idx[m] = i
        if len(self.tv):
            tt = tri_hit(o, d, self.tv, self.te1, self.te2)
            tt = np.where(tt > EPS, tt, VERY_FAR)
            # triangle must beat current best by > EPS (bvh.h:134)
            j = np.argmin(tt, 1)
            tbest = tt[np.arange(n), j]
            m = (t - tbest) > EPS
            t[m] = tbest[m]; kind[m] = 1; idx[m] = j[m]
        return t, kind, idx

    def occluded(self, o, d, maxd):
        n = o.shape[0]
        occ = np.zeros(n, bool)
        for i in range(len(self.radius)):
            ti = sphere_hit(o, d, self.center[i], self.radius[i])
            occ |= (ti > 0) & ((ti + EPS) < maxd)
        if len(self.tv):
            tt = tri_hit(o, d, self.tv, self.te1, self.te2)
            occ |= ((tt > EPS) & ((maxd[:, None] - tt) > EPS)).any(1)
        return occ


def onb(w):
    a = np.where(np.abs(w[..., 0:1]) > 0.9, [0.0, 1.0, 0.0], [1.0, 0.0, 0.0])
    u = norm(np.cross(a, w))
    return u, np.cross(w, u)


def cone_sample_np(dirn, extent, r1, r2):
    d = norm(dirn)
    use_x = np.abs(d[..., 0]) > np.abs(d[..., 2])
    o1 = np.where(use_x[..., None],
                  np.stack([-d[..., 1], d[..., 0], np.zeros_like(d[..., 0])], -1),
                  np.stack([np.zeros_like(d[..., 0]), -d[..., 2], d[..., 1]], -1))
    o1 = norm(o1)
    o2 = norm(np.cross(d, o1))
    phi = r1 * 2 * PI
    z = 1 - r2 * extent
    om = np.sqrt(np.maximum(1 - z * z, 0))
    return (np.cos(phi) * om)[..., None] * o1 + (np.sin(phi) * om)[..., None] * o2 \
        + z[..., None] * d


def ggx_d_np(nh, alpha):
    a2 = alpha * alpha
    c = nh * nh * (a2 - 1.0) + 1.0
    return a2 / np.maximum(PI * c * c, 1e-12)


def ggx_g1_np(nx, alpha):
    a2 = alpha * alpha
    nx = np.maximum(nx, 0.0)
    return 2.0 * nx / np.maximum(nx + np.sqrt(a2 + (1.0 - a2) * nx * nx),
                                 1e-12)


def ggx_d_vec_np(normal, h, alpha):
    cr = np.cross(normal, h)
    sin2 = np.sum(cr * cr, -1)
    a2 = alpha * alpha
    c = sin2 + a2 * np.maximum(1.0 - sin2, 0.0)
    return a2 / np.maximum(PI * c * c, 1e-12)


def ggx_eval_np(normal, view, ldir, alpha, f0):
    h = norm(view + ldir)
    nv = np.sum(normal * view, -1)
    nl = np.sum(normal * ldir, -1)
    hv = np.maximum(np.sum(h * view, -1), 0.0)
    d_term = ggx_d_vec_np(normal, h, alpha)
    g_term = ggx_g1_np(nv, alpha) * ggx_g1_np(nl, alpha)
    fres = f0 + (1.0 - f0) * (1.0 - hv)[:, None] ** 5
    denom = np.maximum(4.0 * np.maximum(nv, 0) * np.maximum(nl, 0), 1e-8)
    return fres * (d_term * g_term / denom)[:, None]


def ggx_vndf_sample_np(view, normal, alpha, u1, u2):
    """Heitz 2018 VNDF sampling (numpy mirror of ops/sampling.py)."""
    tu, tv = onb(normal)
    v = np.stack([np.sum(view * tu, -1), np.sum(view * tv, -1),
                  np.sum(view * normal, -1)], -1)
    h = np.stack([alpha * v[:, 0], alpha * v[:, 1], v[:, 2]], -1)
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
    lensq = h[:, 0] ** 2 + h[:, 1] ** 2
    inv = 1.0 / np.sqrt(np.maximum(lensq, 1e-20))
    t1 = np.where((lensq > 1e-16)[:, None],
                  np.stack([-h[:, 1] * inv, h[:, 0] * inv,
                            np.zeros_like(inv)], -1),
                  np.array([1.0, 0.0, 0.0])[None])
    t2 = np.cross(h, t1)
    r = np.sqrt(np.maximum(u1, 0.0))
    phi = 2 * PI * u2
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    s = 0.5 * (1.0 + h[:, 2])
    p2 = (1.0 - s) * np.sqrt(np.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    pz = np.sqrt(np.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[:, None] * t1 + p2[:, None] * t2 + pz[:, None] * h
    m = np.stack([alpha * nh[:, 0], alpha * nh[:, 1],
                  np.maximum(nh[:, 2], 0.0)], -1)
    m = m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-20)
    return m[:, 0:1] * tu + m[:, 1:2] * tv + m[:, 2:3] * normal


def hg_phase_np(cos_t, g):
    if abs(g) < 1e-4:
        return np.full_like(np.asarray(cos_t, float), 1.0 / (4 * PI))
    den = np.maximum(1 + g * g - 2 * g * cos_t, 1e-12)
    return (1 - g * g) / (4 * PI * den * np.sqrt(den))


def hg_sample_np(dirs, g, u1, u2):
    d = norm(dirs)
    if abs(g) < 1e-4:
        ct = 1 - 2 * u1
    else:
        sq = (1 - g * g) / (1 - g + 2 * g * u1)
        ct = (1 + g * g - sq * sq) / (2 * g)
    ct = np.clip(ct, -1, 1)
    st = np.sqrt(np.maximum(1 - ct * ct, 0))
    phi = 2 * PI * u2
    u, v = onb(d)
    return u * (np.cos(phi) * st)[:, None] + v * (np.sin(phi) * st)[:, None] \
        + d * ct[:, None]


def slab_overlap_np(o, d, t_limit, z_min, z_max):
    """Overlap [ta, ta+L] of rays with the fog slab, clipped to [0, t_limit]
    (numpy mirror of render._fog_overlap)."""
    oz, dz = o[:, 2], d[:, 2]
    safe = np.where(np.abs(dz) < 1e-12, 1e-12, dz)
    t0 = (z_min - oz) / safe
    t1 = (z_max - oz) / safe
    ta = np.minimum(t0, t1)
    tb = np.maximum(t0, t1)
    par = np.abs(dz) < 1e-12
    inside = (oz >= z_min) & (oz <= z_max)
    ta = np.where(par, np.where(inside, 0.0, VERY_FAR), ta)
    tb = np.where(par, np.where(inside, VERY_FAR, 0.0), tb)
    ta = np.maximum(ta, 0.0)
    tb = np.minimum(tb, t_limit)
    return ta, np.maximum(tb - ta, 0.0)


def render_oracle(scene: OracleScene, cam_pos, cam_dir, cam_right, cam_up,
                  width, height, paths_per_pixel, sun_dir,
                  focal_distance=1.0, lens_radius=0.0, seed=0,
                  max_bounces=MAX_BOUNCES, mis=False, fog=None,
                  dispersion=0.0):
    """Renders [H*W, 4] accumulation (rgb sum + terminated count)."""
    rng = np.random.default_rng(seed)
    P = width * height
    accum = np.zeros((P, 4))

    pix = np.repeat(np.arange(P), paths_per_pixel)
    n = pix.shape[0]
    x = (pix % width).astype(float)
    y = (pix // width).astype(float)
    px = x - rng.uniform(size=n)
    py = y - rng.uniform(size=n)
    ni = px / width - 0.5
    nj = (height - py) / height - 0.5
    d = norm(cam_dir[None] + ni[:, None] * cam_right[None] + nj[:, None] * cam_up[None])
    conv = cam_pos[None] + focal_distance * 3.0 * d
    pl = lens_radius * (rng.uniform(-1, 1, (n, 2)))  # crude lens (tests use 0)
    o = cam_pos[None] + pl[:, 0:1] * cam_right[None] + pl[:, 1:2] * cam_up[None]
    d = norm(conv - o)

    direct = np.ones((n, 3))
    last_spec = np.ones(n, bool)
    bounces = np.zeros(n, int)
    alive = np.ones(n, bool)
    bpdf = np.ones(n)  # MIS: pdf of the BSDF sample that made each ray
    color_out = np.zeros((n, 3))
    terminated = np.zeros(n)

    li = scene.light_index
    sun_extent = 1.0 - SUN_ANGULAR_COS
    # fog = (sigma_s, sigma_a, g, z_min, z_max[, falloff]) — volumetric
    # slab medium; optional exponential height falloff
    # density(z) = sigma * exp(-falloff * z)
    fog_on = fog is not None and (fog[0] + fog[1]) > 0
    if fog_on:
        f_ss, f_sa, f_g, f_zmin, f_zmax = fog[:5]
        f_fall = fog[5] if len(fog) > 5 else 0.0
        f_st = f_ss + f_sa
        f_alb = f_ss / f_st


    def fog_tau_np(oo, dd, ta, s):
        """Optical depth over [ta, ta+s] of the (possibly height-falloff)
        medium along each ray."""
        if not f_fall:
            return f_st * s
        rho0 = np.exp(np.clip(-f_fall * (oo[:, 2] + dd[:, 2] * ta), -60, 60))
        k = f_fall * dd[:, 2]
        tiny = np.abs(k) < 1e-12
        ks = np.where(tiny, 1.0, k)
        ratio = np.where(tiny, s, -np.expm1(-ks * s) / ks)
        return f_st * rho0 * ratio

    for _ in range(max_bounces + 2):
        if not alive.any():
            break
        idxs = np.nonzero(alive)[0]
        oo, dd = o[idxs], d[idxs]
        t, kind, ident = scene.intersect(oo, dd)
        if fog_on:
            # free-flight sampling against the slab overlap: a collision
            # before the surface becomes a medium event (kind 2)
            fta, flen = slab_overlap_np(oo, dd, t, f_zmin, f_zmax)
            fu = rng.uniform(size=len(t))
            e = -np.log1p(-np.minimum(fu, 1 - 1e-12))
            if f_fall:
                rho0 = np.exp(np.clip(
                    -f_fall * (oo[:, 2] + dd[:, 2] * fta), -60, 60))
                k = f_fall * dd[:, 2]
                tiny = np.abs(k) < 1e-12
                ks = np.where(tiny, 1.0, k)
                g_ = e * ks / (f_st * rho0)
                fs = np.where(tiny, e / (f_st * rho0),
                              -np.log1p(-np.minimum(g_, 1 - 1e-12)) / ks)
                fs = np.where(~tiny & (g_ >= 1.0), VERY_FAR, fs)
            else:
                fs = e / f_st
            fev = fs < flen
            t = np.where(fev, fta + fs, t)
            kind = np.where(fev, 2, kind)
        hit = t < VERY_FAR

        # --- miss ---
        miss = ~hit
        mi = idxs[miss]
        if len(mi):
            mdir = dd[miss]
            if mis:
                sky_only = sky_np(mdir, sun_dir)
                both = sunsky_np(mdir, sun_dir)
                in_cone = mdir @ sun_dir > SUN_ANGULAR_COS
                p_sun_sa = 0.5 / (2 * PI * sun_extent)
                wsun = np.where(
                    last_spec[mi] | ~in_cone | (bpdf[mi] <= 0), 1.0,
                    bpdf[mi] / np.maximum(bpdf[mi] + p_sun_sa, 1e-12))
                skycol = sky_only + wsun[:, None] * (both - sky_only)
            else:
                skycol = np.where(last_spec[mi][:, None],
                                  sunsky_np(mdir, sun_dir),
                                  sky_np(mdir, sun_dir))
            color_out[mi] += direct[mi] * skycol
            terminated[mi] += 1
            alive[mi] = False

        hi = idxs[hit]
        if not len(hi):
            continue
        th = t[hit]; kd = kind[hit]; idh = ident[hit]
        oh = oo[hit] + dd[hit] * th[:, None]
        dh = dd[hit]

        is_s = kd == 0
        is_f = kd == 2  # fog medium event
        normal = np.empty((len(hi), 3))
        refl = np.full(len(hi), DIFF)
        objc = np.ones((len(hi), 3))
        rgh = np.full(len(hi), 0.3)
        if is_s.any():
            si = idh[is_s]
            normal[is_s] = (oh[is_s] - scene.center[si]) / scene.radius[si][:, None]
            refl[is_s] = scene.refl[si]
            objc[is_s] = scene.color[si]
            rgh[is_s] = scene.rough[si]
        it = kd == 1
        if it.any():
            ti = idh[it]
            normal[it] = norm(np.cross(scene.te1[ti], scene.te2[ti]))
        if is_f.any():
            normal[is_f] = -dh[is_f]
            refl[is_f] = FOG
            direct[hi[is_f]] *= f_alb  # single-scatter albedo

        mul = is_s & (refl != REFR) & (refl != LIGHT) & (refl != GGX)
        direct[hi[mul]] *= objc[mul]
        dcur = direct[hi]

        outside = np.sum(normal * dh, -1) < 0
        normal = np.where(outside[:, None], normal, -normal)
        oh = oh + normal * EPS

        # LIGHT
        isl = refl == LIGHT
        if isl.any():
            li_ids = idh[isl]
            spec_mask = last_spec[hi[isl]]
            emitted = scene.emission[li_ids] * dcur[isl]
            if mis:
                # balance heuristic vs the NEE pdf of sampling this point
                cosl = np.maximum(-np.sum(normal[isl] * dh[isl], -1), 1e-6)
                area_h = 4 * PI * scene.radius[li_ids] ** 2
                tl = (float(len(scene.light_indices))
                      if len(scene.light_indices) > 1 else 1.0)
                p_hit = (0.5 / tl) * th[isl] ** 2 \
                    / np.maximum(cosl * area_h, 1e-12)
                bi = bpdf[hi[isl]]
                wh = np.where(spec_mask | (bi <= 0), 1.0,
                              bi / np.maximum(bi + p_hit, 1e-12))
                np.add.at(color_out, hi[isl], emitted * wh[:, None])
                dcur[isl] = 0.0
            else:
                color_out[hi[isl][spec_mask]] += emitted[spec_mask]
                # zero throughput where light hit on a non-specular path
                zmask = isl.copy()
                zmask[np.nonzero(isl)[0][spec_mask]] = False
                dcur[zmask] = 0.0

        last_spec[hi] = False
        m = len(hi)

        # NEE shared
        sun_s = cone_sample_np(np.broadcast_to(sun_dir, (m, 3)), sun_extent,
                               rng.uniform(size=m), rng.uniform(size=m))
        sun_cos = np.sum(normal * sun_s, -1)
        choose_sun = rng.uniform(size=m) < 0.5

        lts = np.asarray(scene.light_indices, int)
        n_lights = len(lts)
        if n_lights > 1:
            la = lts[rng.integers(0, n_lights, m)]
        else:
            la = np.full(m, li, int)
        lc, lr = scene.center[la], scene.radius[la]
        le = scene.emission[la]
        cp = 2 * rng.uniform(size=m) - 1
        sp = np.sqrt(np.maximum(1 - cp * cp, 0))
        th2 = 2 * PI * rng.uniform(size=m)
        lpnt = lc + lr[:, None] * np.stack(
            [sp * np.sin(th2), cp, sp * np.cos(th2)], -1)
        lvec = lpnt - oh
        ld2 = np.sum(lvec * lvec, -1)
        ldist = np.sqrt(ld2)
        ldir = lvec / ldist[:, None]
        nl = norm(lpnt - lc)
        cos_surf = np.sum(normal * ldir, -1)
        cos_light = np.sum(nl * -ldir, -1)
        sangle = cos_light * (4 * PI * lr * lr) / ld2

        w = norm(dh - normal * 2 * np.sum(normal * dh, -1)[:, None])
        pe = 40.0

        shadow_dir = np.where(choose_sun[:, None], sun_s, ldir)
        shadow_maxd = np.where(choose_sun, VERY_FAR, ldist)
        sunrad = sun_np(sun_s, sun_dir)

        isd = refl == DIFF
        isp = refl == PHONG
        pc_sun = np.sum(sun_s * w, -1)
        pc_l = np.sum(ldir * w, -1)
        sc_diff = np.where(choose_sun[:, None],
                           2 * dcur * sunrad * (sun_cos * 1e-5)[:, None],
                           le * (2 * n_lights) * dcur
                           * (sangle * INV_PI * cos_surf)[:, None])
        sc_ph = np.where(
            choose_sun[:, None],
            2 * dcur * ((pe + 2) * 0.5 * INV_PI) * sunrad
            * (sun_cos * np.maximum(pc_sun, 0) ** pe * 1e-5)[:, None],
            le * (2 * n_lights) * dcur * (sangle * (pe + 2) * 0.5 * INV_PI
                             * np.maximum(pc_l, 0) ** pe * cos_surf)[:, None])
        ok_diff = isd & np.where(choose_sun, sun_cos > 0,
                                 (cos_surf > 0) & (cos_light > 0))
        ok_ph = isp & np.where(choose_sun, (sun_cos > 0) & (pc_sun > EPS),
                               (cos_surf > 0) & (cos_light > 0) & (pc_l > EPS))
        # GGX NEE (beyond-reference)
        isg = refl == GGX
        view = -dh
        galpha = rgh * rgh
        f_gs = ggx_eval_np(normal, view, sun_s, galpha, objc)
        f_gl = ggx_eval_np(normal, view, ldir, galpha, objc)
        sc_ggx = np.where(
            choose_sun[:, None],
            2 * dcur * sunrad * f_gs * (sun_cos * 1e-5)[:, None],
            le * (2 * n_lights) * dcur * f_gl
            * (sangle * cos_surf)[:, None])
        ok_ggx = isg & np.where(choose_sun, sun_cos > 0,
                                (cos_surf > 0) & (cos_light > 0))
        if fog_on:
            # medium-event NEE: phase replaces BRDF*cos (see render._shade
            # for the pi*1e-5 sun-scale derivation)
            cs_f = np.sum(dh * sun_s, -1)
            cl_f = np.sum(dh * ldir, -1)
            sc_fog = np.where(
                choose_sun[:, None],
                2 * dcur * sunrad
                * (hg_phase_np(cs_f, f_g) * PI * 1e-5)[:, None],
                le * (2 * n_lights) * dcur
                * (sangle * hg_phase_np(cl_f, f_g))[:, None])
            ok_fog = is_f & np.where(choose_sun, True, cos_light > 0)
        else:
            ok_fog = np.zeros_like(ok_diff)

        def pdf_toward(ddir):
            """BSDF solid-angle pdf toward ddir (MIS; 0 for delta lobes)."""
            c = np.sum(normal * ddir, -1)
            p = np.where(isd, np.maximum(c, 0) * INV_PI, 0.0)
            pcq = np.maximum(np.sum(ddir * w, -1), 0.0)
            p = np.where(isp, (pe + 1) * 0.5 * INV_PI * pcq ** pe, p)
            nv = np.maximum(np.sum(normal * view, -1), 1e-6)
            hh = norm(view + ddir)
            pg = ggx_g1_np(nv, galpha) \
                * ggx_d_vec_np(normal, hh, galpha) / (4 * nv)
            p = np.where(isg, pg, p)
            if fog_on:
                p = np.where(is_f,
                             hg_phase_np(np.sum(dh * ddir, -1), f_g), p)
            return p

        sok = ok_diff | ok_ph | ok_ggx | ok_fog
        if sok.any():
            occ = scene.occluded(oh[sok], shadow_dir[sok], shadow_maxd[sok])
            contrib = np.where(
                isd[sok][:, None], sc_diff[sok],
                np.where(isg[sok][:, None], sc_ggx[sok], sc_ph[sok]))
            if fog_on:
                contrib = np.where(is_f[sok][:, None], sc_fog[sok], contrib)
                # slab transmittance along the shadow segment
                shta, shl = slab_overlap_np(
                    oh[sok], shadow_dir[sok],
                    np.where(choose_sun[sok], VERY_FAR, ldist[sok]),
                    f_zmin, f_zmax)
                contrib = contrib * np.exp(-fog_tau_np(
                    oh[sok], shadow_dir[sok], shta, shl))[:, None]
            if mis:
                p_sun_sa = 0.5 / (2 * PI * sun_extent)
                w_sun_nee = p_sun_sa / (p_sun_sa + pdf_toward(sun_s))
                p_l_sa = (0.5 / n_lights) * ld2 \
                    / np.maximum(cos_light * (4 * PI * lr * lr), 1e-12)
                w_l_nee = p_l_sa / np.maximum(p_l_sa + pdf_toward(ldir),
                                              1e-12)
                w_nee = np.where(choose_sun, w_sun_nee, w_l_nee)
                contrib = contrib * w_nee[sok][:, None]
            add = np.where(occ[:, None], 0.0, contrib)
            np.add.at(color_out, hi[sok], add)

        # bounce
        nd = dh.copy()
        # DIFF
        if isd.any():
            u, v = onb(normal[isd])
            r1 = 2 * PI * rng.uniform(size=isd.sum())
            r2 = rng.uniform(size=isd.sum())
            r2s = np.sqrt(r2)
            dnew = norm(u * (np.cos(r1) * r2s)[:, None]
                        + v * (np.sin(r1) * r2s)[:, None]
                        + normal[isd] * np.sqrt(1 - r2)[:, None])
            can = bounces[hi[isd]] < max_bounces
            nd[isd] = np.where(can[:, None], dnew, dh[isd])
        # SPEC
        iss = refl == SPEC
        refl_dir = dh - 2 * np.sum(dh * normal, -1)[:, None] * normal
        nd[iss] = refl_dir[iss]
        last_spec[hi[iss]] = True
        # REFR
        isr = refl == REFR
        if isr.any():
            eta = np.full(int(isr.sum()), 1.2)
            if dispersion:
                # stochastic wavelength-channel collapse before the
                # Fresnel test (mirrors render._shade dispersion)
                dg = dcur[isr]
                poly = (dg > 0).sum(1) > 1
                pick = np.minimum(
                    (rng.uniform(size=len(dg)) * 3).astype(int), 2)
                chan = np.where(poly, pick, dg.argmax(1))
                eta = eta * (1 + dispersion * (chan - 1.0))
                oh3 = np.zeros_like(dg)
                oh3[np.arange(len(dg)), chan] = 1.0
                dcur[isr] = np.where(poly[:, None], dg * 3.0 * oh3, dg)
            n1 = np.where(outside[isr], eta, 1.0)
            n2 = np.where(outside[isr], 1.0, eta)
            r0 = ((n1 - n2) / (n1 + n2)) ** 2
            cosi = -np.sum(normal[isr] * dh[isr], -1)
            nrr = n2 / n1
            st2 = nrr**2 * (1 - cosi**2)
            fres = np.where(st2 > 1, 1.0, r0 + (1 - r0) * (1 - cosi) ** 5)
            does_refl = rng.uniform(size=isr.sum()) < fres
            cost = np.sqrt(np.maximum(1 - st2, 0))
            refr_d = nrr[:, None] * dh[isr] + (nrr * cosi - cost)[:, None] * normal[isr]
            nd[isr] = np.where(does_refl[:, None], refl_dir[isr], refr_d)
            oh[isr] -= np.where(does_refl[:, None], 0.0, 2 * EPS * normal[isr])
            last_spec[hi[isr]] = does_refl
            inside = isr & ~outside
            dcur[inside] *= np.exp(-objc[inside] * th[inside][:, None])
        # PHONG
        if isp.any():
            k = isp.sum()
            wi = w[isp]
            ui, vi = onb(wi)
            dacc = np.zeros((k, 3)); okacc = np.zeros(k, bool)
            for _try in range(16):
                phi = 2 * PI * rng.uniform(size=k)
                r2 = rng.uniform(size=k)
                ct = (1 - r2) ** (1 / (pe + 1))
                st = np.sqrt(np.maximum(1 - ct * ct, 0))
                cand = norm(ui * (np.cos(phi) * st)[:, None]
                            + vi * (np.sin(phi) * st)[:, None] + wi * ct[:, None])
                good = np.sum(cand * normal[isp], -1) > EPS
                take = ~okacc & good
                dacc[take] = cand[take]
                okacc |= take
                if okacc.all():
                    break
            dacc[~okacc] = wi[~okacc]
            nd[isp] = dacc
            oh[isp] += wi * EPS

        # GGX bounce: VNDF half-vector sample, weight F * G1(l)
        if isg.any():
            k = int(isg.sum())
            gu1 = rng.uniform(size=k)
            gu2 = rng.uniform(size=k)
            gh = ggx_vndf_sample_np(view[isg], normal[isg], galpha[isg],
                                    gu1, gu2)
            gd = dh[isg] - 2 * np.sum(dh[isg] * gh, -1)[:, None] * gh
            gnl = np.sum(normal[isg] * gd, -1)
            ghv = np.maximum(np.sum(gh * view[isg], -1), 0.0)
            gF = objc[isg] + (1 - objc[isg]) * (1 - ghv)[:, None] ** 5
            gw = np.where((gnl > EPS)[:, None],
                          gF * ggx_g1_np(gnl, galpha[isg])[:, None], 0.0)
            nd[isg] = gd
            dcur[isg] *= gw

        # FOG bounce: HG phase sample around the incoming direction
        if fog_on and is_f.any():
            k = int(is_f.sum())
            nd[is_f] = hg_sample_np(dh[is_f], f_g, rng.uniform(size=k),
                                    rng.uniform(size=k))

        if mis:
            # delta-born rays (SPEC mirror, REFR both branches) carry
            # pdf 0 == "weight 1 on the emitter-hit side" (matches
            # render._shade's is_delta_born encoding)
            bp = np.maximum(pdf_toward(nd), 1e-8)
            bpdf[hi] = np.where(iss | isr, 0.0, bp)

        # Russian roulette
        pmax = np.minimum(1.0, dcur.max(-1))
        rr = rng.uniform(size=m)
        surv = (bounces[hi] < max_bounces) & (pmax > EPS) & (rr <= pmax)
        dcur = np.where(surv[:, None], dcur / np.maximum(pmax, 1e-20)[:, None], dcur)

        direct[hi] = dcur
        o[hi] = oh
        d[hi] = nd
        bounces[hi] += 1
        dead = hi[~surv]
        terminated[dead] += 1
        alive[dead] = False

    np.add.at(accum[:, :3], pix, color_out)
    np.add.at(accum[:, 3], pix, terminated)
    return accum
