/* Minimal MVE-compatible mve::Bundle (SfM features only). */

#ifndef MVE_BUNDLE_STUB_HEADER
#define MVE_BUNDLE_STUB_HEADER

#include <memory>
#include <vector>

#include "mve/camera.h"

namespace mve {

class Bundle
{
public:
    typedef std::shared_ptr<Bundle> Ptr;
    typedef std::shared_ptr<Bundle const> ConstPtr;

    struct Feature2D
    {
        int view_id = -1;
        int feature_id = -1;
        float pos[2] = {0.0f, 0.0f};
    };

    struct Feature3D
    {
        float pos[3] = {0.0f, 0.0f, 0.0f};
        float color[3] = {0.0f, 0.0f, 0.0f};
        std::vector<Feature2D> refs;

        bool contains_view_id (int id) const
        {
            for (auto const& r : refs)
                if (r.view_id == id)
                    return true;
            return false;
        }
    };

    typedef std::vector<Feature3D> Features;
    typedef std::vector<CameraInfo> Cameras;

    static Ptr create (void) { return Ptr(new Bundle()); }

    Features const& get_features (void) const { return features; }
    Features& get_features (void) { return features; }
    Cameras const& get_cameras (void) const { return cameras; }
    Cameras& get_cameras (void) { return cameras; }

private:
    Features features;
    Cameras cameras;
};

}  // namespace mve

#endif /* MVE_BUNDLE_STUB_HEADER */
