/* Minimal MVE-compatible mve::View: an in-memory embedding map. */

#ifndef MVE_VIEW_STUB_HEADER
#define MVE_VIEW_STUB_HEADER

#include <map>
#include <memory>
#include <stdexcept>
#include <string>

#include "mve/camera.h"
#include "mve/image.h"
#include "util/strings.h"  /* the reference uses util::string via mve/view.h */

namespace mve {

class View
{
public:
    typedef std::shared_ptr<View> Ptr;
    typedef std::shared_ptr<View const> ConstPtr;

    static Ptr create (void) { return Ptr(new View()); }

    int get_id (void) const { return id; }
    void set_id (int view_id) { id = view_id; }

    CameraInfo const& get_camera (void) const { return camera; }
    void set_camera (CameraInfo const& cam) { camera = cam; }

    bool has_image (std::string const& name) const
    {
        return images.count(name) > 0;
    }

    ByteImage::Ptr get_byte_image (std::string const& name) const
    {
        return std::dynamic_pointer_cast<ByteImage>(get(name));
    }

    FloatImage::Ptr get_float_image (std::string const& name) const
    {
        return std::dynamic_pointer_cast<FloatImage>(get(name));
    }

    void set_image (ImageBase::Ptr image, std::string const& name)
    {
        images[name] = image;
    }

    void remove_image (std::string const& name) { images.erase(name); }

    /* Persistence is a no-op for the in-memory harness. */
    void save_view (void) {}
    void reload_view (void) {}
    void cache_cleanup (void) {}

private:
    ImageBase::Ptr get (std::string const& name) const
    {
        auto it = images.find(name);
        if (it == images.end())
            throw std::runtime_error("view " + std::to_string(id)
                + ": no embedding '" + name + "'");
        return it->second;
    }

    int id = -1;
    CameraInfo camera;
    std::map<std::string, ImageBase::Ptr> images;
};

}  // namespace mve

#endif /* MVE_VIEW_STUB_HEADER */
