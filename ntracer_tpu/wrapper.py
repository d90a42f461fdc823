"""``NTracer`` dimension-currying facade (reference lib/ntracer/wrapper.py:71-147).

Caches per-dimension instances and wraps Vector/Matrix/Camera/BoxScene/AABB
so the ``dimension`` argument is filled in automatically; constructors also
accept varargs.  As in the reference, the wrappers construct and return
*base-class* instances (``base(dim, ...)`` inside ``__new__``).
"""

import importlib
import weakref

from . import render as _render

CUBE = 1
SPHERE = 2


def _vector_wrapper(mod, dim):
    base = mod.Vector

    class Vector(base):
        __slots__ = ()

        def __new__(cls, *values):
            if len(values) > 1:
                return base(dim, values)
            return base(dim, *values)

        @staticmethod
        def axis(axis, length=1):
            return base.axis(dim, axis, length)

    return Vector


def _matrix_wrapper(mod, dim):
    base = mod.Matrix

    class Matrix(base):
        __slots__ = ()

        def __new__(cls, *values):
            if len(values) > 1:
                return base(dim, values)
            return base(dim, *values)

        @staticmethod
        def scale(factor):
            if isinstance(factor, mod.Vector):
                return base.scale(factor)
            return base.scale(dim, factor)

        @staticmethod
        def identity():
            return base.identity(dim)

    return Matrix


def _camera_wrapper(mod, dim):
    base = mod.Camera

    class Camera(base):
        def __new__(cls):
            return base(dim)

    return Camera


def _boxscene_wrapper(mod, dim):
    base = mod.BoxScene

    class BoxScene(base):
        def __new__(cls):
            return base(dim)

    return BoxScene


def _aabb_wrapper(mod, dim):
    base = mod.AABB

    class AABB(base):
        __slots__ = ()

        def __new__(cls, *args, **kwds):
            return base(dim, *args, **kwds)

    return AABB


class NTracer:
    """Per-dimension facade over the tracer modules (see the reference's
    docstring in lib/ntracer/wrapper.py:71-99)."""

    _cache = weakref.WeakValueDictionary()

    def __new__(cls, dimension, force_generic=False):
        if not force_generic:
            obj = NTracer._cache.get(dimension)
            if obj is not None:
                return obj

        obj = object.__new__(cls)

        if force_generic:
            mod = importlib.import_module("ntracer_tpu.tracern")
        else:
            mod = _render.get_optimized_tracern(dimension)

        obj.dimension = dimension
        obj.base = mod
        obj.Vector = _vector_wrapper(mod, dimension)
        obj.Matrix = _matrix_wrapper(mod, dimension)
        obj.Camera = _camera_wrapper(mod, dimension)
        obj.BoxScene = _boxscene_wrapper(mod, dimension)
        obj.AABB = _aabb_wrapper(mod, dimension)

        for n in [
                "CompositeScene", "KDNode", "KDLeaf", "KDBranch", "Primitive",
                "PrimitiveBatch", "PrimitivePrototype", "Solid",
                "SolidPrototype", "Triangle", "TriangleBatch",
                "TrianglePrototype", "TriangleBatchPrototype", "PointLight",
                "GlobalLight", "dot", "cross", "build_kdtree",
                "build_composite_scene", "screen_coord_to_ray", "BATCH_SIZE"]:
            setattr(obj, n, getattr(mod, n))

        if not force_generic:
            NTracer._cache[dimension] = obj

        return obj
