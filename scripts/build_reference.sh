#!/bin/sh
# Build the original C++ NTracer (read-only at /root/reference) into
# /tmp/refbuild for parity gates and benchmark comparisons.  /tmp is wiped
# between sessions — re-run this script when
# /tmp/refbuild/build/lib.linux-x86_64-cpython-312 is missing.
#
# The patches below adapt the 2013-2019 codebase to this image
# (GCC 12 + CPython 3.12 + setuptools>=68); they do not change behavior:
#   1. setup.py: PEP 440 version string, mkpath() lost its dry_run kwarg.
#   2. -march=native -> -march=nehalem: the AVX/AVX-512 SIMD paths fail to
#      compile under GCC 12 (v_type_s_512 conversion errors in generated
#      simd.hpp); nehalem = SSE4.2-only, BATCH_SIZE=4.
#   3. simd.hpp.in: reduce(std::plus<...>) needs <functional>.
#   4. py_common.hpp: CPython 3.12 removed _PyObject_GC_Malloc; replicate
#      its allocation layout (zeroed two-pointer GC head before the object)
#      so PyObject_GC_Track / PyObject_GC_Del keep working.
#   5. geom_allocator.hpp: size_t needs <cstddef> under GCC 12.
set -e

DEST=${1:-/tmp/refbuild}
SRC=/root/reference

rm -rf "$DEST"
cp -r "$SRC" "$DEST"
cd "$DEST"

sed -i "s/version=ver or 'unversioned',/version=ver or '0.0.0',/" setup.py
sed -i 's/mkpath(self.build_temp,dry_run=self.dry_run)/mkpath(self.build_temp)/' setup.py
sed -i "s/'-march=native',/'-march=nehalem',/g; s/'-march=native']/'-march=nehalem']/g" setup.py
sed -i 's/#include <algorithm>/#include <algorithm>\n#include <functional>/' src/simd.hpp.in
sed -i 's/#include "compatibility.hpp"/#include "compatibility.hpp"\n#include <cstddef>\nusing std::size_t;/' src/geom_allocator.hpp

python - << 'EOF'
p = "src/py_common.hpp"
s = open(p).read()
old = """#define PY_MEM_GC_NEW_DELETE static void *operator new(size_t s) {  \\
        void *ptr = _PyObject_GC_Malloc(s);                         \\
        if(!ptr) throw std::bad_alloc();                            \\
        return ptr;                                                 \\
    }"""
new = """/* CPython 3.12 removed _PyObject_GC_Malloc; replicate its layout (a
   zeroed GC head of two pointers directly before the object so
   PyObject_GC_Track / PyObject_GC_Del keep working). */
inline void *compat_gc_malloc(size_t s) {
    const size_t presize = 2 * sizeof(PyObject*);
    char *base = (char*)PyObject_Malloc(s + presize);
    if(!base) return nullptr;
    memset(base,0,presize);
    return base + presize;
}

#define PY_MEM_GC_NEW_DELETE static void *operator new(size_t s) {  \\
        void *ptr = compat_gc_malloc(s);                            \\
        if(!ptr) throw std::bad_alloc();                            \\
        return ptr;                                                 \\
    }"""
assert old in s, "py_common.hpp changed upstream"
s = s.replace(old, new)
if "#include <cstring>" not in s:
    s = s.replace("#define py_common_hpp", "#define py_common_hpp\n\n#include <cstring>", 1)
open(p, "w").write(s)
EOF

python setup.py build -j 4
echo "reference built: $DEST/build/lib.linux-x86_64-cpython-312"
