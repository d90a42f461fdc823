"""API tests ported from the reference suite
(/root/reference/lib/ntracer/tests/test.py) — same cases, same
generic/specialized duality (every geometry test runs with the fixed-d and
the force_generic module paths).
"""

import os
import pickle
import random

import pytest

from ntracer_tpu.wrapper import NTracer, CUBE, SPHERE
from ntracer_tpu.render import Material, Color, LockedError


def pydot(a, b):
    return sum(ia * ib for ia, ib in zip(a, b))


def rand_vector(nt, lo=-1000, hi=1000):
    return nt.Vector([random.uniform(lo, hi) for _ in range(nt.dimension)])


def rand_triangle_verts(nt):
    points = []
    d = nt.dimension
    for i in range(d):
        points.append(nt.Vector(
            [random.uniform(-10, 10) for _ in range(0, i)]
            + [random.uniform(1, 10)]
            + [0 for _ in range(i + 1, d)]))
    return points


@pytest.fixture(params=[False, True], ids=["specialized", "generic"])
def generic(request):
    return request.param


def get_nt(d, generic=False):
    return NTracer(d, generic)


def assert_vector_almost_equal(va, vb, places=4):
    assert len(va) == len(vb)
    for a, b in zip(va, vb):
        assert abs(a - b) < 10 ** -places


def test_simd():
    d = 64
    while d > 4:
        nt = get_nt(d)
        a = nt.Vector(range(d))
        b = nt.Vector(x + 12 for x in range(d - 1, -1, -1))
        assert abs(nt.dot(a, b) - pydot(a, b)) / abs(pydot(a, b)) < 1e-4
        d >>= 1


def test_math(generic):
    nt = get_nt(4, generic)
    ma = nt.Matrix([[10, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12], [13, 14, 15, 16]])
    mb = nt.Matrix([13, 6, 9, 6, 7, 3, 3, 13, 1, 11, 12, 7, 12, 15, 17, 15])
    mx = ma * mb
    my = nt.Matrix([195, 159, 200, 167, 210, 245, 283, 277, 342, 385, 447, 441,
                    474, 525, 611, 605])
    assert list(mx.values) == list(my.values)
    assert_vector_almost_equal(list((mb * mb.inverse()).values),
                               [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1])
    assert_vector_almost_equal(nt.Vector(13, 2, 16, 14).unit(),
                               [0.52, 0.08, 0.64, 0.56])


def test_aabb(generic):
    nt = get_nt(5, generic)
    a = nt.AABB((1, 7, -5, 5, 4), (5, 13, -1, 6, 12))
    assert a.dimension == 5
    assert list(a.end) == [5, 13, -1, 6, 12]
    assert list(a.start) == [1, 7, -5, 5, 4]
    assert list(a.right(2, -3).start) == [1, 7, -3, 5, 4]
    assert list(a.left(0, 2).end) == [2, 13, -1, 6, 12]


def test_triangle(generic):
    nt = get_nt(3, generic)
    mat = Material((1, 1, 1))
    box = nt.AABB((-1, -1, -1), (1, 1, 1))

    assert not box.intersects(nt.TrianglePrototype([
        (-2.092357, 0.1627209, 0.9231308),
        (0.274588, 0.8528936, 2.309217),
        (-1.212236, 1.855952, 0.3137006)], mat))

    assert not box.intersects(nt.TrianglePrototype([
        (2.048058, -3.022543, 1.447644),
        (1.961913, -0.5438575, -0.1552723),
        (0.3618142, -1.684767, 0.2162201)], mat))

    assert not box.intersects(nt.TrianglePrototype([
        (-4.335572, -1.690142, -1.302721),
        (0.8976227, 0.5090631, 4.6815),
        (-0.8176082, 4.334341, -1.763081)], mat))

    assert box.intersects(nt.TrianglePrototype([
        (0, 0, 0),
        (5, 5, 5),
        (1, 2, 3)], mat))

    assert nt.AABB(
        (-0.894424974918, -1.0, -0.850639998913),
        (0.0, -0.447214990854, 0.850639998913)).intersects(
            nt.TrianglePrototype([
                (0.0, -1.0, 0.0),
                (0.723599970341, -0.447214990854, 0.525720000267),
                (-0.276385009289, -0.447214990854, 0.850639998913)], mat))

    points = [rand_triangle_verts(nt) for _ in range(nt.BATCH_SIZE)]
    max_v = min_v = points[0][0]
    for tri in points:
        for p in tri:
            max_v = [max(a, b) for a, b in zip(max_v, p)]
            min_v = [min(a, b) for a, b in zip(min_v, p)]
    tbp = nt.TriangleBatchPrototype(nt.TrianglePrototype(tri, mat)
                                    for tri in points)
    assert_vector_almost_equal(tbp.boundary.start, min_v)
    assert_vector_almost_equal(tbp.boundary.end, max_v)


def test_cube(generic):
    nt = get_nt(3, generic)
    mat = Material((1, 1, 1))
    box = nt.AABB((-1, -1, -1), (1, 1, 1))

    assert not box.intersects(nt.SolidPrototype(
        CUBE,
        nt.Vector(1.356136, 1.717844, 1.577731),
        nt.Matrix(-0.01922399, -0.3460019, 0.8615935,
                  -0.03032121, -0.6326356, -0.5065715,
                  0.03728577, -0.6928598, 0.03227519),
        mat))

    assert not box.intersects(nt.SolidPrototype(
        CUBE,
        nt.Vector(1.444041, 1.433598, 1.975453),
        nt.Matrix(0.3780299, -0.3535482, 0.8556266,
                  -0.7643852, -0.6406123, 0.07301452,
                  0.5223108, -0.6816301, -0.5124177),
        mat))

    assert not box.intersects(nt.SolidPrototype(
        CUBE,
        nt.Vector(-0.31218, -3.436678, 1.473133),
        nt.Matrix(0.8241131, -0.2224413, 1.540015,
                  -1.461101, -0.7099018, 0.6793453,
                  0.5350775, -1.595884, -0.516849),
        mat))

    assert not box.intersects(nt.SolidPrototype(
        CUBE,
        nt.Vector(0.7697315, -3.758033, 1.847144),
        nt.Matrix(0.6002195, -1.608681, -0.3900863,
                  -1.461104, -0.7098908, 0.6793506,
                  -0.7779449, 0.0921175, -1.576897),
        mat))

    assert box.intersects(nt.SolidPrototype(
        CUBE,
        nt.Vector(0.4581598, -1.56134, 0.5541568),
        nt.Matrix(0.3780299, -0.3535482, 0.8556266,
                  -0.7643852, -0.6406123, 0.07301452,
                  0.5223108, -0.6816301, -0.5124177),
        mat))


def test_sphere(generic):
    nt = get_nt(3, generic)
    mat = Material((1, 1, 1))
    box = nt.AABB((-1, -1, -1), (1, 1, 1))

    assert not box.intersects(nt.SolidPrototype(
        SPHERE,
        nt.Vector(-1.32138, 1.6959, 1.729396),
        nt.Matrix.identity(),
        mat))

    assert box.intersects(nt.SolidPrototype(
        SPHERE,
        nt.Vector(1.623511, -1.521197, -1.243952),
        nt.Matrix.identity(),
        mat))


def test_batch_interface(generic):
    nt = get_nt(4, generic)

    def lo():
        return random.uniform(-1, 1)

    def hi():
        return random.uniform(9, 11)

    protos = []
    for i in range(nt.BATCH_SIZE):
        protos.append(nt.TrianglePrototype([
            (lo(), lo(), lo(), lo()),
            (lo(), hi(), lo(), lo()),
            (hi(), lo(), lo(), lo()),
            (lo(), lo(), hi(), lo())], Material((1, 1, 1.0 / (i + 1)))))

    bproto = nt.TriangleBatchPrototype(protos)
    for i in range(nt.BATCH_SIZE):
        assert protos[i].face_normal == bproto.face_normal[i]
        for j in range(nt.dimension):
            assert protos[i].point_data[j].point == bproto.point_data[j].point[i]
            assert (protos[i].point_data[j].edge_normal
                    == bproto.point_data[j].edge_normal[i])
        assert protos[i].material is bproto.material[i]


def test_buffer_interface(generic):
    nt = get_nt(7, generic)
    v = nt.Vector(1, 2, 3, 4, 5, 6, 7)
    assert list(v) == list(memoryview(v))

    c = Color(0.5, 0.1, 0)
    assert list(c) == list(memoryview(c))


def test_kdtree(generic):
    nt = get_nt(3, generic)
    mat = Material((1, 1, 1))
    primitives = [
        nt.Triangle(
            (-1.1755770444869995, 0.3819499611854553, -1.6180520057678223),
            (1.7082732915878296, -2.3512351512908936, 1.4531432390213013),
            [(-0.615524172782898, -0.3236003816127777, 0.19999605417251587),
             (0.49796950817108154, 0.0381958931684494, -0.5235964059829712)], mat),
        nt.Triangle(
            (-1.1755770444869995, 0.3819499611854553, -1.6180520057678223),
            (1.0557708740234375, -1.4531433582305908, 0.8980922102928162),
            [(-0.8057316541671753, -0.06180214881896973, 0.8471965789794922),
             (0.19020742177963257, -0.2617982029914856, -0.6472004652023315)], mat),
        nt.Triangle(
            (0.7265498042106628, 0.9999955296516418, 1.6180428266525269),
            (0, 1.7961481809616089, 0.8980742692947388),
            [(-1.1135050058364868, -0.1618017703294754, 0.32360348105430603),
             (0.6881839036941528, -0.09999901801347733, 0.19999800622463226)], mat),
        nt.Triangle(
            (0.7265498042106628, 0.9999955296516418, 1.6180428266525269),
            (0, 2.90622878074646, 1.4531147480010986),
            [(-0.4253210127353668, -0.26180076599121094, 0.5236014127731323),
             (0.6881839036941528, 0.09999898821115494, -0.1999979317188263)], mat),
        nt.Triangle(
            (1.9021340608596802, 0.618022620677948, -0.3819592595100403),
            (-1.055770754814148, -1.4531432390213013, 0.8980920910835266),
            [(-0.30776214599609375, -0.42359834909439087, -1.0471925735473633),
             (0.4979696571826935, -0.038195837289094925, 0.5235962867736816)], mat),
        nt.Triangle(
            (1.9021340608596802, 0.618022620677948, -0.3819592595100403),
            (-1.7082730531692505, -2.3512353897094727, 1.4531434774398804),
            [(0.19020749628543854, -0.4617941677570343, -0.5235962271690369),
             (0.19020745158195496, 0.2617981433868408, 0.6472005844116211)], mat)]
    scene = nt.CompositeScene(
        nt.AABB(
            (-1.710653305053711e-05, 0.618022620677948, -0.3819774389266968),
            (0.7265291213989258, 2.000016689300537, 0.3819882869720459)),
        nt.KDBranch(1, 2.0000057220458984,
                    nt.KDBranch(1, 0.9999955296516418,
                                None,
                                nt.KDLeaf([
                                    primitives[4],
                                    primitives[5],
                                    primitives[2],
                                    primitives[3],
                                    primitives[1],
                                    primitives[0]])),
                    nt.KDLeaf([
                        primitives[4],
                        primitives[5],
                        primitives[1],
                        primitives[0]])))
    scene.set_fov(0.8)
    hits = scene.root.intersects(
        (4.917067527770996, 2.508934497833252, -4.304379940032959),
        (-0.7135500907897949, -0.1356230527162552, 0.6873518228530884))
    assert len(hits) == 1
    assert primitives.index(hits[0].primitive) == 4
    assert hits[0].batch_index == -1


def check_pickle_roundtrip(x):
    y = pickle.loads(pickle.dumps(x))
    return y


def material_equal(a, b):
    return (a.color == b.color and a.opacity == b.opacity
            and a.reflectivity == b.reflectivity
            and a.specular_intensity == b.specular_intensity
            and a.specular_exp == b.specular_exp and a.specular == b.specular)


def test_pickle():
    mat = Material((1, 1, 1))
    assert material_equal(check_pickle_roundtrip(mat), mat)
    c = Color(0.2, 0.1, 1)
    assert check_pickle_roundtrip(c) == c
    for d in [3, 5, 12]:
        nt = get_nt(d)
        v = rand_vector(nt)
        assert check_pickle_roundtrip(v) == v
        a = nt.AABB(rand_vector(nt, -100, 50), rand_vector(nt, 51, 200))
        a2 = check_pickle_roundtrip(a)
        assert a2.start == a.start and a2.end == a.end
        t = nt.Triangle(rand_vector(nt), rand_vector(nt),
                        [rand_vector(nt) for _ in range(nt.dimension - 1)], mat)
        t2 = check_pickle_roundtrip(t)
        assert t2.p1 == t.p1 and t2.face_normal == t.face_normal
        assert list(t2.edge_normals) == list(t.edge_normals)
        assert material_equal(t2.material, t.material)


def test_triangle_batch_pickle():
    nt = get_nt(4)
    mat = Material((1, 1, 1))
    tris = [nt.Triangle.from_points(rand_triangle_verts(nt), mat)
            for _ in range(nt.BATCH_SIZE)]
    batch = nt.TriangleBatch(tris)
    b2 = check_pickle_roundtrip(batch)
    for t1, t2 in zip(batch, b2):
        assert t1.p1 == t2.p1 and t1.face_normal == t2.face_normal


def check_triangle_points_roundtrip(nt, points):
    newpoints = nt.Triangle.from_points(points, Material((1, 1, 1))).to_points()
    for old, new in zip(points, newpoints):
        for c1, c2 in zip(old, new):
            assert abs(c1 - c2) < 1e-4 * max(1.0, abs(c1))


def test_to_from_points(generic):
    nt = get_nt(5, generic)
    check_triangle_points_roundtrip(nt, rand_triangle_verts(nt))

    mat = Material((1, 1, 1))
    points = [rand_triangle_verts(nt) for _ in range(nt.BATCH_SIZE)]
    tbproto = nt.TriangleBatchPrototype(
        nt.TriangleBatch([nt.Triangle.from_points(p, mat) for p in points]))
    for i in range(nt.BATCH_SIZE):
        [tp.point[i] for tp in tbproto.point_data]


def test_solid_pickle():
    nt = get_nt(3)
    mat = Material((1, 1, 1))
    s = nt.Solid(CUBE, nt.Vector(1, 2, 3), nt.Matrix.identity(), mat)
    s2 = check_pickle_roundtrip(s)
    assert s2.type == s.type
    assert s2.position == s.position
    assert list(s2.orientation.values) == list(s.orientation.values)


def test_kdnode_copy_pickle():
    import copy
    nt = get_nt(3)
    mat = Material((1, 1, 1))
    t = nt.Triangle.from_points(
        [nt.Vector(1, 0, 0), nt.Vector(0, 1, 0), nt.Vector(0, 0, 1)], mat)
    leaf = nt.KDLeaf([t])
    root = nt.KDBranch(0, 0.5, None, leaf)
    c = copy.copy(root)
    assert c.axis == root.axis and c.split == root.split
    assert list(c.right) == list(leaf)
    d = copy.deepcopy(root)
    assert d.right is not leaf
    r2 = pickle.loads(pickle.dumps(root))
    assert r2.axis == 0 and r2.left is None and len(r2.right) == 1
    # a copied child has its own parent slot: reusing it must still fail
    with pytest.raises(ValueError):
        nt.KDBranch(1, 0.0, leaf, None)


def test_star_polytope_construction():
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "scripts"))
    from fractions import Fraction
    from polytope import star_prototypes, polytope_vertices
    nt = get_nt(3)
    protos = star_prototypes(nt, [Fraction(5, 2), Fraction(5)],
                             Material((1, 0.5, 0.5)))
    # small stellated dodecahedron: 12 pentagram faces x 10 fan triangles
    assert len(protos) == 120
    assert len(polytope_vertices([5, 3])) == 20


def walk_bounds(n, aabb, nt, f):
    f(aabb, n)
    if isinstance(n, nt.KDBranch):
        walk_bounds(n.left, aabb.left(n.axis, n.split), nt, f)
        walk_bounds(n.right, aabb.right(n.axis, n.split), nt, f)


def test_kd_tree_gen():
    """Resurrected from the reference's commented-out check_kdtree
    (test.py:96-108, 408-417): every leaf's AABB must contain exactly the
    prototypes that exactly-intersect it.

    Containment is checked against the BUILD-TIME prototypes
    (update_primitives=True keeps them): reconstructing prototypes from the
    leaf primitives via to_points is ill-conditioned for thin simplices and
    perturbs the AABBs — plausibly why the reference never enabled this
    test."""
    mat = Material((1, 1, 1))
    nt = get_nt(4)
    random.seed(42)
    for j in range(4):
        protos = []
        for i in range(nt.BATCH_SIZE * 4):
            protos.append(nt.TrianglePrototype(rand_triangle_verts(nt), mat))
        protos_list = list(protos)
        scene = nt.build_composite_scene(protos_list, max_depth=1,
                                         split_threshold=1,
                                         update_primitives=True)
        by_prim = {id(p.primitive): p for p in protos_list}

        leaf_boundaries = []

        def handler(aabb, node):
            if node is None:
                leaf_boundaries.append((aabb, frozenset()))
            elif isinstance(node, nt.KDLeaf):
                leaf_boundaries.append((aabb, frozenset(id(p) for p in node)))

        walk_bounds(scene.root, scene.boundary, nt, handler)
        assert leaf_boundaries
        for pid_, proto in by_prim.items():
            for bound, contained in leaf_boundaries:
                assert bound.intersects(proto) == (pid_ in contained), \
                    f"leaf containment mismatch (iteration {j})"


def test_parallel_kd_build_deterministic():
    """extra_threads builds must produce the identical tree (the parallel
    native build flattens in deterministic pre-order)."""
    import numpy as np
    from ntracer_tpu.kdnodes import KDBranch, KDLeaf
    nt = NTracer(3)
    mat = Material((1, 0.5, 0.5))
    rng = np.random.RandomState(17)
    protos = []
    for _ in range(300):
        base = rng.uniform(-3, 3, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.5, 0.5, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))

    def tree_sig(node, out):
        if node is None:
            out.append(("none",))
        elif isinstance(node, KDLeaf):
            out.append(("leaf", len(node)))
        else:
            out.append(("branch", node.axis, node.split))
            tree_sig(node.left, out)
            tree_sig(node.right, out)
        return out

    _, _, r0 = nt.build_kdtree(list(protos), 0)
    _, _, r4 = nt.build_kdtree(list(protos), 4)
    assert tree_sig(r0, []) == tree_sig(r4, [])


def test_group_window_quality():
    """The greedy batching's bounded candidate scan (GROUP_WINDOW) is a
    perf-only deviation from the reference's O(n^2) pass
    (tracer.hpp:2395-2427); quantify the quality loss: total combined-AABB
    surface of the windowed batches must be within 10% of the exhaustive
    scan's."""
    import numpy as np
    from ntracer_tpu import kdtree
    from ntracer_tpu.wrapper import NTracer
    from ntracer_tpu.render import Material

    nt = NTracer(3)
    mat = Material((1, 1, 1))
    rng = np.random.RandomState(17)
    protos = []
    for _ in range(1200):
        base = rng.uniform(-4, 4, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.3, 0.3, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))

    def total_surface(groups):
        tot = 0.0
        for g in groups:
            ext = (g.boundary._end - g.boundary._start).astype(np.float64)
            d = len(ext)
            for i in range(d):
                s = 1.0
                for j in range(d):
                    if i != j:
                        s *= ext[j]
                tot += s
        return tot

    win = kdtree.GROUP_WINDOW
    try:
        kdtree.GROUP_WINDOW = 96
        windowed = total_surface(kdtree.group_primitives(protos))
        kdtree.GROUP_WINDOW = 10 ** 9
        exhaustive = total_surface(kdtree.group_primitives(protos))
    finally:
        kdtree.GROUP_WINDOW = win

    assert exhaustive > 0
    ratio = windowed / exhaustive
    print(f"group window quality ratio: {ratio:.4f}")
    assert ratio < 1.10


def test_light_lists(generic):
    """PointLightList/GlobalLightList sequence views
    (ntracer_body.hpp:620-630): append/extend with type + dimension checks,
    reflected in the scene; mutation respects the scene lock."""
    nt = get_nt(3, generic)
    mat = Material((1, 1, 1))
    scene = nt.build_composite_scene([nt.TrianglePrototype(
        [nt.Vector(1, 0, 0), nt.Vector(0, 1, 0), nt.Vector(0, 0, 1)], mat)])

    pl = scene.point_lights
    assert type(pl).__name__ == "PointLightList" and len(pl) == 0
    pl.append(nt.PointLight(nt.Vector(0, 4, 0), (1, 1, 1)))
    assert len(scene.point_lights) == 1
    assert scene.point_lights[0].position[1] == 4

    gl = scene.global_lights
    gl.extend([nt.GlobalLight(nt.Vector(0, -1, 0), (0.2, 0.2, 0.2))])
    assert len(scene.global_lights) == 1

    with pytest.raises(TypeError):
        pl.append(nt.GlobalLight(nt.Vector(0, -1, 0), (1, 1, 1)))
    with pytest.raises(TypeError):
        nt4 = get_nt(4, generic)
        pl.append(nt4.PointLight(nt4.Vector(0, 4, 0, 0), (1, 1, 1)))

    # item assignment + deletion (cs_light_list_setitem,
    # ntracer_body.hpp:3131-3146: del swaps with the last element, then pops)
    pl.append(nt.PointLight(nt.Vector(5, 5, 5), (1, 0, 0)))
    pl.append(nt.PointLight(nt.Vector(6, 6, 6), (0, 1, 0)))
    assert len(pl) == 3
    pl[1] = nt.PointLight(nt.Vector(7, 7, 7), (0, 0, 1))
    assert scene.point_lights[1].position[0] == 7
    assert pl[-1].position[0] == 6
    del pl[0]  # swaps last (6,6,6) into slot 0
    assert len(pl) == 2
    assert pl[0].position[0] == 6 and pl[1].position[0] == 7
    del pl[-1]
    assert len(pl) == 1 and pl[0].position[0] == 6
    with pytest.raises(TypeError):
        pl[0] = nt.GlobalLight(nt.Vector(0, -1, 0), (1, 1, 1))
    with pytest.raises(IndexError):
        pl[5] = nt.PointLight(nt.Vector(1, 1, 1), (1, 1, 1))
    with pytest.raises(IndexError):
        del pl[-2]

    scene._lock()
    try:
        with pytest.raises(LockedError):
            pl.append(nt.PointLight(nt.Vector(1, 1, 1), (1, 1, 1)))
        with pytest.raises(LockedError):
            pl[0] = nt.PointLight(nt.Vector(1, 1, 1), (1, 1, 1))
        with pytest.raises(LockedError):
            del pl[0]
    finally:
        scene._unlock()
    assert len(pl) == 1


def test_reference_suite_passes():
    """Run the ORIGINAL package's own unittest suite
    (/root/reference/lib/ntracer/tests/test.py) against this package —
    the strongest API-compatibility statement available.  The file is
    loaded from the reference tree at runtime (nothing is copied); only
    its two relative imports are rewritten to absolute ones."""
    import types
    import unittest

    ref = "/root/reference/lib/ntracer/tests/test.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not available")
    with open(ref) as f:
        src = f.read()
    src = src.replace("from ..wrapper import", "from ntracer.wrapper import")
    src = src.replace("from ..render import", "from ntracer.render import")
    mod = types.ModuleType("reference_suite")
    exec(compile(src, ref, "exec"), mod.__dict__)
    suite = unittest.defaultTestLoader.loadTestsFromModule(mod)
    result = unittest.TextTestRunner(verbosity=0).run(suite)
    assert result.testsRun >= 10
    assert not result.failures and not result.errors


def test_triangle_prototype_batch_bitexact():
    """TrianglePrototype.batch_from_points (the vectorized OBJ-scale load
    path) must produce fields BIT-IDENTICAL to the scalar constructor —
    same Crout-LU cofactor crosses (vm.batched_cross), same BLAS dot —
    across dimensions including the generic-d range."""
    import numpy as np
    from ntracer_tpu.primitives import TrianglePrototype
    from ntracer_tpu.render import Material

    rng = np.random.RandomState(3)
    for d in (3, 4, 5, 8, 10):
        mat = Material((1, 0.5, 0.25))
        pts = rng.uniform(-3, 3, (40, d, d)).astype(np.float32)
        batch = TrianglePrototype.batch_from_points(pts, mat)
        assert len(batch) == 40
        for i in range(40):
            ref = TrianglePrototype([p for p in pts[i]], mat)
            got = batch[i]
            rt, gt = ref.primitive, got.primitive
            np.testing.assert_array_equal(rt._p1, gt._p1)
            np.testing.assert_array_equal(rt._fn, gt._fn)
            np.testing.assert_array_equal(rt._en, gt._en)
            assert rt._d == gt._d
            np.testing.assert_array_equal(
                np.asarray(list(ref.boundary.start)),
                np.asarray(list(got.boundary.start)))
            np.testing.assert_array_equal(
                np.asarray(list(ref.boundary.end)),
                np.asarray(list(got.boundary.end)))
            np.testing.assert_array_equal(ref._first_edge_normal,
                                          got._first_edge_normal)
            assert gt.material is mat

    # per-prototype material sequence + validation errors
    mats = [Material((1, 0, 0)), Material((0, 1, 0))]
    pts3 = rng.uniform(-1, 1, (2, 3, 3)).astype(np.float32)
    protos = TrianglePrototype.batch_from_points(pts3, mats)
    assert protos[0].material is mats[0] and protos[1].material is mats[1]
    import pytest as _pytest
    with _pytest.raises(TypeError):
        TrianglePrototype.batch_from_points(pts3, mats[:1])
    with _pytest.raises(TypeError):
        TrianglePrototype.batch_from_points(pts3[:, :2, :], mats)


def test_group_select_native_matches_python(monkeypatch):
    """The native ntr_group_select must reproduce the Python grouping
    loop's decisions bit-for-bit (same metric in the same f32 order, same
    stable (metric, index) selection, same early exit) — the grouped
    output lists must be identical object-for-object / array-for-array."""
    import numpy as np
    from ntracer_tpu import kdtree, native
    from ntracer_tpu.primitives import (TrianglePrototype,
                                        TriangleBatchPrototype)
    from ntracer_tpu.render import Material
    from ntracer_tpu.wrapper import NTracer

    if native.get_lib() is None or \
            not getattr(native.get_lib(), "_has_group_select", False):
        pytest.skip("native library unavailable")

    rng = np.random.RandomState(17)
    mat = Material((1, 0.5, 0.5))
    for d in (3, 4, 5):
        pts = rng.uniform(-3, 3, (403, d, d)).astype(np.float32)
        # materialize the lazy sequence: this test exercises the
        # mixed-source object path (the lazy all-array path has its own
        # test below)
        protos = list(TrianglePrototype.batch_from_points(pts, mat))
        # plus a handful of scalar-constructed ones (mixed-source path)
        nt = NTracer(d)
        for _ in range(5):
            base = rng.uniform(-2, 2, d)
            protos.append(nt.TrianglePrototype(
                [nt.Vector(*(base + rng.uniform(-0.5, 0.5, d)))
                 for _ in range(d)], mat))

        a = kdtree.group_primitives(list(protos))     # native path
        monkeypatch.setattr(native, "group_select",
                            lambda *args, **kw: None)
        b = kdtree.group_primitives(list(protos))     # python fallback
        monkeypatch.undo()

        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert type(x) is type(y)
            if isinstance(x, TriangleBatchPrototype):
                np.testing.assert_array_equal(x._points, y._points)
                np.testing.assert_array_equal(x.primitive._en,
                                              y.primitive._en)
                np.testing.assert_array_equal(x.primitive._d,
                                              y.primitive._d)
                assert x.primitive._materials == y.primitive._materials
            else:
                assert x is y


@pytest.mark.parametrize("native_select", [True, False])
def test_batch_from_points_lazy_pipeline_matches_list(monkeypatch,
                                                      native_select):
    """batch_from_points returns a lazy TrianglePrototypeSequence; the
    array fast paths it enables (scene._build validation skip, the
    build_tree AABB merge, group_primitives' object-free grouping, and
    the native-assembly bundle consumed by build_tree_native) must
    produce results identical to materializing the list up front —
    including byte-identical scene pickles."""
    import pickle
    import numpy as np
    from ntracer_tpu import kdtree, native
    from ntracer_tpu.primitives import (TrianglePrototype,
                                        TrianglePrototypeSequence,
                                        TriangleBatchPrototype)
    from ntracer_tpu.render import Material
    from ntracer_tpu.scene import build_composite_scene

    if not native_select:
        # lazy path over the Python selection-loop fallback
        monkeypatch.setattr(native, "group_select",
                            lambda *args, **kw: None)

    rng = np.random.RandomState(7)
    mat = Material((1, 0.5, 0.25))
    for n, d in ((403, 3), (57, 5)):
        pts = rng.uniform(-3, 3, (n, d, d)).astype(np.float32)
        seq = TrianglePrototype.batch_from_points(pts, mat)
        assert isinstance(seq, TrianglePrototypeSequence)
        assert len(seq) == n and seq.dimension == d
        assert seq[-1].material is mat
        assert len(seq[1:4]) == 3
        assert isinstance(seq + [], list) and isinstance([] + seq, list)
        assert seq[n - 1] is seq[-1]        # materialization is cached

        ga = kdtree.group_primitives(seq)
        gb = kdtree.group_primitives(list(seq))
        assert getattr(ga, "_assembly", None) is not None
        assert len(ga) == len(gb)
        saw_leftover = False
        for x, y in zip(ga, gb):
            assert type(x) is type(y)
            if isinstance(x, TriangleBatchPrototype):
                np.testing.assert_array_equal(x._points, y._points)
                np.testing.assert_array_equal(x.primitive._en,
                                              y.primitive._en)
                np.testing.assert_array_equal(x.primitive._d,
                                              y.primitive._d)
                assert x.primitive._materials == y.primitive._materials
                np.testing.assert_array_equal(
                    np.asarray(list(x.boundary.start)),
                    np.asarray(list(y.boundary.start)))
            else:
                saw_leftover = True
                assert x is y               # same cached object
        assert saw_leftover                 # 403/57 aren't multiples of 8

        # whole-pipeline equality: the scenes built from the lazy
        # sequence and from the materialized list pickle identically
        sa = build_composite_scene(seq)
        sb = build_composite_scene(
            list(TrianglePrototype.batch_from_points(pts, mat)))
        assert pickle.dumps(sa) == pickle.dumps(sb)

    # per-prototype material sequences ride the lazy path too
    mats = [Material((1, 0, 0)), Material((0, 1, 0))] * 8
    pts3 = rng.uniform(-1, 1, (16, 3, 3)).astype(np.float32)
    seq = TrianglePrototype.batch_from_points(pts3, mats)
    grouped = kdtree.group_primitives(seq)
    ref = kdtree.group_primitives(list(
        TrianglePrototype.batch_from_points(pts3, mats)))
    for x, y in zip(grouped, ref):
        assert x.primitive._materials == y.primitive._materials
