// Force-included prelude: nvcc makes <cstring> and global min/max
// available implicitly; plain g++ needs them spelled out.
#ifndef FLRL_STUB_PRELUDE_H
#define FLRL_STUB_PRELUDE_H

#include <algorithm>
#include <cstring>

using std::max;
using std::min;

#endif  // FLRL_STUB_PRELUDE_H
