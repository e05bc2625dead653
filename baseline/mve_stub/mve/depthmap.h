/* Minimal MVE-compatible depthmap helpers for the baseline harness. */

#ifndef MVE_DEPTHMAP_STUB_HEADER
#define MVE_DEPTHMAP_STUB_HEADER

#include <cmath>

#include "math/matrix.h"
#include "math/vector.h"
#include "mve/image.h"

namespace mve {
namespace image {

/* Convert between z-depth and MVE's distance-along-ray convention:
 * factor = |invproj * (x+0.5, y+0.5, 1)|; multiply when to_mve. */
template <typename T>
void
depthmap_convert_conventions (typename Image<T>::Ptr dm,
    math::Matrix3f const& invproj, bool to_mve)
{
    int const w = dm->width();
    int const h = dm->height();
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
        {
            math::Vec3f const px(float(x) + 0.5f, float(y) + 0.5f, 1.0f);
            float const norm = (invproj * px).norm();
            T& v = dm->at(x, y, 0);
            if (v <= T(0))
                continue;
            v = to_mve ? T(v * norm) : T(v / norm);
        }
}

}  // namespace image
}  // namespace mve

#endif /* MVE_DEPTHMAP_STUB_HEADER */
