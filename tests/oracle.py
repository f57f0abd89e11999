"""Independent scalar-path-tracer oracle.

A direct, readable reimplementation of the reference integrator
(/root/reference/Renderer.hpp:73-434) in pure numpy scalars — lambertian
closure, sphere geometry, NEE + MIS, Russian roulette, sky — using the SAME
counter-based RNG schedule. It shares no code with the production megakernel
(cpu_raytracing_experiments_tpu/render/renderer.py), so agreement between
the two validates the whole bounce-loop logic, not just its pieces.
"""
import numpy as np

M32 = 0xFFFFFFFF
F32 = np.float32
FLT_EPS = np.float32(1.1920929e-7)


# ---- RNG (Random.hpp) ------------------------------------------------------
def pcg_state(v):
    return (v * 747796405 + 2891336453) & M32


def pcg_out(v):
    word = (((v >> ((v >> 28) + 4)) ^ v) * 277803737) & M32
    return ((word >> 22) ^ word) & M32


class Rng:
    def __init__(self, state):
        self.state = state & M32

    def unit(self):
        out = pcg_out(self.state)
        self.state = pcg_state(self.state)
        return F32(F32(out) * F32(2.0 ** -32))

    def bounded(self, n):
        return min(n - 1, int(self.unit() * n))


def hash_2d(x, y):
    qx = (0x41C64E6D * (((x >> 1) ^ y) & M32)) & M32
    qy = (0x41C64E6D * (((y >> 1) ^ x) & M32)) & M32
    return (0x41C64E6D * ((qx ^ (qy >> 3)) & M32)) & M32


# ---- math (Sampling.hpp) ---------------------------------------------------
def normalize(v):
    return v / np.linalg.norm(v)


def tangent_space(n):
    """-> quat (x,y,z,w), z==0 (Sampling.hpp:150-159)."""
    if n[2] < -1.0 + 1.1920929e-7:
        return np.array([0.0, 1.0, 0.0, 0.0], np.float64)
    s = np.sqrt(2.0 * (n[2] + 1.0))
    invs = 1.0 / s
    return np.array([-n[1] * invs, n[0] * invs, 0.0, s * 0.5], np.float64)


def to_local(t, v):
    temp = 2.0 * (v[2] * t[3] + v[0] * t[1] - t[0] * v[1])
    return np.array(
        [v[0] - t[1] * temp, v[1] + t[0] * temp, temp * t[3] - v[2]], np.float64
    )


def to_world(t, v):
    temp = 2.0 * (v[2] * t[3] - v[0] * t[1] + t[0] * v[1])
    return np.array(
        [v[0] + t[1] * temp, v[1] - t[0] * temp, temp * t[3] - v[2]], np.float64
    )


def cosine_hemisphere(t, s):
    phi = 2.0 * np.pi * s
    st = np.sqrt(t)
    ct = np.sqrt(max(0.0, 1.0 - t))
    return np.array([st * np.cos(phi), st * np.sin(phi), ct], np.float64)


def orthonormal_basis(n):
    sign = -1.0 if np.signbit(n[2]) else 1.0
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    v2 = np.array([1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0]])
    v3 = np.array([b, sign + a * n[1] * n[1], -n[1]])
    return v2, v3


def cone_pdf(cos_max):
    return (0.5 / np.pi) / max(1e-6, 1.0 - cos_max)


def sphere_pdf(r2, d2):
    s2 = r2 / d2
    return cone_pdf(np.sqrt(max(0.0, 1.0 - s2)))


def sample_dir_to_sphere(wc, sin2, cdist, r2, t, s):
    cos_max = np.sqrt(max(0.0, 1.0 - sin2))
    pdf = cone_pdf(cos_max)
    small = sin2 < 0.00068523
    cos_t = 1.0 - t * (1.0 - cos_max)
    sin_t = np.sqrt(sin2 * t)
    blend = sin_t if small else cos_t
    inv = np.sqrt(max(0.0, 1.0 - blend * blend))
    cos_t, sin_t = (inv, sin_t) if small else (cos_t, inv)
    temp = cdist * sin_t
    raw = cdist * cos_t - np.sqrt(max(0.0, r2 - temp * temp))
    dist = raw - max(1e-5, raw * 1e-5)  # scale-aware pull-back (see sampling.py)
    phi = 2.0 * np.pi * s
    local = np.array([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t])
    x, y = orthonormal_basis(wc)
    return x * local[0] + y * local[1] + wc * local[2], dist, pdf


def power_heuristic(f, g):
    return f * f / max(1e-6, f * f + g * g)


def power_heuristic_over_f(f, g):
    return f / max(1e-6, f * f + g * g)


# ---- geometry --------------------------------------------------------------
def intersect_all(p, d, centers, radius_sq):
    """Reference root-selection (BVH.hpp:270-287). Returns (t, prim)|None."""
    best_t, best = np.inf, -1
    for j in range(len(radius_sq)):
        to_c = centers[j] - p
        b = float(np.dot(d, to_c))
        disc = float(radius_sq[j] - np.dot(to_c, to_c) + b * b)
        if disc < 0:
            continue
        sq = np.sqrt(disc)
        t = b - sq
        if t < 0:
            t = b + sq
        if t < 0 or t >= best_t:
            continue
        best_t, best = t, j
    return best_t, best


def occluded(p, d, tfar, centers, radius_sq):
    for j in range(len(radius_sq)):
        to_c = centers[j] - p
        b = float(np.dot(d, to_c))
        disc = float(radius_sq[j] - np.dot(to_c, to_c) + b * b)
        if disc < 0:
            continue
        sq = np.sqrt(disc)
        t = b - sq
        if t < 0:
            t = b + sq
        if t < 0 or t >= tfar:
            continue
        return True
    return False


# ---- the integrator --------------------------------------------------------
def trace_pixel(scene_np, x, y, accumulation, seed, max_bounces, width, height,
                camera):
    """One full path for pixel (x, y) -> radiance [3]."""
    centers = scene_np["centers"]
    radius_sq = scene_np["radius_sq"]
    mat_id = scene_np["mat_id"]
    albedo = scene_np["albedo"]
    emission = scene_np["emission"]
    lights = scene_np["lights"]
    ambient = scene_np["ambient"]
    light_count = len(lights)
    lsel_pdf = 1.0 / light_count if light_count else 0.0

    # camera ray (Camera.hpp:80-88)
    r = Rng(hash_2d(accumulation, seed))
    sx, sy = r.unit(), r.unit()
    view = np.array(
        [x + sx - camera["half_w"], y + sy - camera["half_h"], camera["z"]]
    )
    qx, qy, qz, qw = camera["orient"]
    qv = np.array([qx, qy, qz])
    t2 = 2.0 * np.cross(qv, normalize(view))
    d = normalize(view) + qw * t2 + np.cross(qv, t2)
    d = normalize(d)
    p = np.array(camera["pos"], np.float64)

    radiance = np.zeros(3)
    throughput = np.ones(3)
    prev_pdf = 0.0

    for bounce in range(max_bounces):
        tfar, prim = intersect_all(p, d, centers, radius_sq)
        if prim < 0:
            if ambient.max() > 0.0:
                radiance += throughput * ambient  # constant sky
            break
        m = mat_id[prim]
        hit_pt = p + d * tfar
        n = normalize(hit_pt - centers[prim])
        if np.dot(n, d) >= 0.0:
            n = -n
        tq = tangent_space(n)
        v_local = to_local(tq, -d)
        eps = max(1e-4, 3e-5 * np.abs(hit_pt).max())  # scale-aware offset
        p_off = hit_pt + n * eps

        # NEE (Renderer.hpp:247-298)
        if light_count:
            rn = Rng(hash_2d(accumulation, (seed + bounce * 2) & M32))
            lt, ls = rn.unit(), rn.unit()
            sel = rn.bounded(light_count)
            lp = lights[sel]
            ok = lp != prim
            wc = centers[lp] - p_off
            cd2 = float(np.dot(wc, wc))
            ok = ok and cd2 > radius_sq[lp]
            if ok:
                cd = np.sqrt(cd2)
                wc = wc / cd
                sin2 = radius_sq[lp] / cd2
                ndw = to_local(tq, wc)[2]
                if not (ndw < 0.0 and sin2 < ndw * ndw):
                    ldir, ldist, lpdf = sample_dir_to_sphere(
                        wc, sin2, cd, radius_sq[lp], lt, ls
                    )
                    l_local = to_local(tq, ldir)
                    if l_local[2] >= 0.0:
                        ndotl = max(0.0, l_local[2])
                        shadow_rad = (
                            emission[mat_id[lp]]
                            * throughput
                            * (albedo[m] * (ndotl / np.pi))
                        )
                        lpdf = lpdf * lsel_pdf
                        brdf_pdf = ndotl / np.pi
                        shadow_rad = shadow_rad * power_heuristic_over_f(
                            lpdf, brdf_pdf
                        )
                        if shadow_rad.max() > 0.0 and not occluded(
                            p_off, ldir, ldist, centers, radius_sq
                        ):
                            radiance += shadow_rad

        # emissive hit (Renderer.hpp:319-353)
        em = emission[m]
        if em.max() > FLT_EPS:
            if bounce > 0 and light_count:
                r2 = radius_sq[prim]
                ndotv = v_local[2]
                cd2 = tfar * (tfar + ndotv * 2.0 * np.sqrt(r2)) + r2
                w = power_heuristic(prev_pdf, lsel_pdf * sphere_pdf(r2, max(cd2, 1e-20)))
            else:
                w = 1.0
            radiance += throughput * em * w

        # BRDF sample + RR (Renderer.hpp:357-404)
        rb = Rng(hash_2d(accumulation, (seed + bounce * 2 + 1) & M32))
        u, v = rb.unit(), rb.unit()
        local_dir = cosine_hemisphere(u, v)
        new_thr = throughput * albedo[m]
        q = 1.0 - new_thr.max()
        if rb.unit() < q:
            break
        new_thr = new_thr / max(FLT_EPS, 1.0 - q)
        world_dir = to_world(tq, local_dir)
        prev_pdf = max(0.0, local_dir[2]) / np.pi
        p, d, throughput = p_off, world_dir, new_thr

    return radiance


# ---- GGX closure (DataStreams.hpp:184-218, Sampling.hpp:252-309) -----------
def _disk(t, s):
    phi = 2.0 * np.pi * s
    r = np.sqrt(t)
    return r * np.cos(phi), r * np.sin(phi)


def vndf_sample(v_local, alpha, u, v):
    a = max(alpha, 1e-6)
    vv = normalize(np.array([a * v_local[0], a * v_local[1], v_local[2]]))
    dx, dy = _disk(u, v)
    t = 1.0 - dx * dx
    lerp_t = vv[2] * 0.5 + 0.5
    dy = np.sqrt(max(0.0, t)) * (1.0 - lerp_t) + dy * lerp_t
    x, y = orthonormal_basis(vv)
    hz = np.sqrt(max(0.0, t - dy * dy))
    h = x * dx + y * dy + vv * hz
    return normalize(np.array([a * h[0], a * h[1], max(0.0, h[2])]))


def pow5(x):
    t = x * x
    return x * t * t


def fresnel(f0, hv, f80=None):
    w = pow5(min(max(1.0 - hv, 0.0), 1.0))
    if f80 is None:
        return f0 * (1.0 - w) + w
    return f0 * (1.0 - w) + f80 * w


def ggx_d(a2, ndh2):
    temp = 1.0 + (a2 - 1.0) * ndh2
    return a2 / (np.pi * temp * temp)


def smith_g2_lagarde(a2, ndl, ndv):
    a = ndv * np.sqrt(a2 + ndl * (ndl - a2 * ndl))
    b = ndl * np.sqrt(a2 + ndv * (ndv - a2 * ndv))
    return 0.5 / max(a + b, 1e-20)


def g1_ggx(a2, nds2):
    return 2.0 / (1.0 + np.sqrt(((a2 * (1.0 - nds2)) + nds2) / max(nds2, 1e-20)))


def g2_over_g1(a2, ndl, ndv):
    g1v = g1_ggx(a2, ndv * ndv)
    g1l = g1_ggx(a2, ndl * ndl)
    return g1l / max(g1v + g1l - g1v * g1l, 1e-20)


def ggx_eval(f0, alpha, l_local, v_local, f80=None):
    ndl = max(0.0, l_local[2])
    ndv = max(0.0, v_local[2])
    h = normalize(l_local + v_local)
    ndh = max(0.0, h[2])
    hdv = max(0.0, float(np.dot(h, v_local)))
    a2 = alpha * alpha
    return fresnel(f0, hdv, f80) * (
        ndl * ggx_d(max(1e-5, a2), ndh * ndh) * smith_g2_lagarde(a2, ndl, ndv)
    )


def ggx_pdf(alpha, l_local, v_local):
    if l_local[2] <= 0.0:
        return 0.0
    ndv = max(1e-6, v_local[2])
    h = normalize(l_local + v_local)
    ndh = max(0.0, h[2])
    a2 = max(1e-7, alpha * alpha)
    g1 = g1_ggx(a2, ndv * ndv)
    d = ggx_d(a2, ndh * ndh)
    return g1 * d / max(4.0 * ndv, 1e-6)


def ggx_sample(f0, alpha, v_local, u, v, f80=None):
    ndv = max(0.0, v_local[2])
    if alpha == 0.0:
        direction = np.array([-v_local[0], -v_local[1], v_local[2]])
        hdv = ndv
    else:
        h = vndf_sample(v_local, alpha, u, v)
        hdv_raw = float(np.dot(h, v_local))
        direction = 2.0 * hdv_raw * h - v_local
        hdv = max(0.0, hdv_raw)
    ndl = max(0.0, direction[2])
    est = fresnel(f0, hdv, f80) * g2_over_g1(alpha * alpha, ndl, ndv)
    return direction, est


def trace_pixel_ggx(scene_np, x, y, accumulation, seed, max_bounces, width,
                    height, camera):
    """GGX-mode path (policy.brdf='ggx'): F0/alpha closure everywhere."""
    centers = scene_np["centers"]
    radius_sq = scene_np["radius_sq"]
    mat_id = scene_np["mat_id"]
    f0s = scene_np["f0"]
    # two-point Schlick (policy.shade_f80, the production default); absent
    # key = classic Schlick (f80 -> white)
    f80s = scene_np.get("f80")
    rough = scene_np["roughness"]
    emission = scene_np["emission"]
    lights = scene_np["lights"]
    ambient = scene_np["ambient"]
    light_count = len(lights)
    lsel_pdf = 1.0 / light_count if light_count else 0.0

    r = Rng(hash_2d(accumulation, seed))
    sx, sy = r.unit(), r.unit()
    view = np.array([x + sx - camera["half_w"], y + sy - camera["half_h"], camera["z"]])
    qx, qy, qz, qw = camera["orient"]
    qv = np.array([qx, qy, qz])
    t2 = 2.0 * np.cross(qv, normalize(view))
    d = normalize(normalize(view) + qw * t2 + np.cross(qv, t2))
    p = np.array(camera["pos"], np.float64)

    radiance = np.zeros(3)
    throughput = np.ones(3)
    prev_pdf = 0.0

    for bounce in range(max_bounces):
        tfar, prim = intersect_all(p, d, centers, radius_sq)
        if prim < 0:
            if ambient.max() > 0.0:
                radiance += throughput * ambient
            break
        m = mat_id[prim]
        alpha = rough[m] * rough[m]
        f0 = f0s[m]
        f80 = None if f80s is None else f80s[m]
        hit_pt = p + d * tfar
        n = normalize(hit_pt - centers[prim])
        if np.dot(n, d) >= 0.0:
            n = -n
        tq = tangent_space(n)
        v_local = to_local(tq, -d)
        eps = max(1e-4, 3e-5 * np.abs(hit_pt).max())
        p_off = hit_pt + n * eps

        if light_count:
            rn = Rng(hash_2d(accumulation, (seed + bounce * 2) & M32))
            lt, ls = rn.unit(), rn.unit()
            sel = rn.bounded(light_count)
            lp = lights[sel]
            ok = lp != prim
            wc = centers[lp] - p_off
            cd2 = float(np.dot(wc, wc))
            ok = ok and cd2 > radius_sq[lp]
            if ok:
                cd = np.sqrt(cd2)
                wc = wc / cd
                sin2 = radius_sq[lp] / cd2
                ndw = to_local(tq, wc)[2]
                if not (ndw < 0.0 and sin2 < ndw * ndw):
                    ldir, ldist, lpdf = sample_dir_to_sphere(
                        wc, sin2, cd, radius_sq[lp], lt, ls
                    )
                    l_local = to_local(tq, ldir)
                    if l_local[2] >= 0.0:
                        shadow_rad = (
                            emission[mat_id[lp]] * throughput
                            * ggx_eval(f0, alpha, l_local, v_local, f80)
                        )
                        lpdf = lpdf * lsel_pdf
                        brdf_pdf = ggx_pdf(alpha, l_local, v_local)
                        shadow_rad = shadow_rad * power_heuristic_over_f(lpdf, brdf_pdf)
                        if shadow_rad.max() > 0.0 and not occluded(
                            p_off, ldir, ldist, centers, radius_sq
                        ):
                            radiance += shadow_rad

        em = emission[m]
        if em.max() > FLT_EPS:
            if bounce > 0 and light_count:
                r2 = radius_sq[prim]
                ndotv = v_local[2]
                cd2 = tfar * (tfar + ndotv * 2.0 * np.sqrt(r2)) + r2
                w = power_heuristic(prev_pdf, lsel_pdf * sphere_pdf(r2, max(cd2, 1e-20)))
            else:
                w = 1.0
            radiance += throughput * em * w

        rb = Rng(hash_2d(accumulation, (seed + bounce * 2 + 1) & M32))
        u, v = rb.unit(), rb.unit()
        local_dir, est = ggx_sample(f0, alpha, v_local, u, v, f80)
        new_thr = throughput * est
        q = 1.0 - new_thr.max()
        if rb.unit() < q:
            break
        new_thr = new_thr / max(FLT_EPS, 1.0 - q)
        world_dir = to_world(tq, local_dir)
        prev_pdf = ggx_pdf(alpha, local_dir, v_local)
        p, d, throughput = p_off, world_dir, new_thr

    return radiance
