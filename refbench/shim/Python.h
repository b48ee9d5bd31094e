/* Minimal stand-in for Python.h so the REFERENCE's Probcons.cc core
 * (everything above its python-binding tail, which build.sh slices off
 * at the "//PYTHON LIB!" marker) compiles as plain C++.  The core uses
 * only the two names below: the PyObject_HEAD macro inside the dormant
 * `Probcons` struct (Probcons.cc:10-13) and one `static PyObject *`
 * pointer declaration (Probcons.cc:38).  Nothing here implements any
 * Python API. */
#ifndef REFBENCH_PYTHON_SHIM_H
#define REFBENCH_PYTHON_SHIM_H
#include <stddef.h> /* the real Python.h drags in size_t; headers rely on it */
#include <string.h> /* ...and strcmp/strlen, used by the sliced core */
typedef struct _refbench_pyobject_stub { int _unused; } PyObject;
#define PyObject_HEAD PyObject _ob_base_stub;
#endif
