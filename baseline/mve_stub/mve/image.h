/* Minimal MVE-compatible mve::Image for the baseline harness.
 *
 * Row-major, channel-interleaved image container matching the MVE API
 * surface the reference smvs `lib/` consumes. Independent implementation.
 */

#ifndef MVE_IMAGE_STUB_HEADER
#define MVE_IMAGE_STUB_HEADER

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <memory>
#include <vector>

#include "math/vector.h"

namespace mve {

class ImageBase
{
public:
    typedef std::shared_ptr<ImageBase> Ptr;
    typedef std::shared_ptr<ImageBase const> ConstPtr;

    virtual ~ImageBase (void) = default;

    int width (void) const { return w; }
    int height (void) const { return h; }
    int channels (void) const { return c; }
    int get_pixel_amount (void) const { return w * h; }
    int get_value_amount (void) const { return w * h * c; }

protected:
    int w = 0, h = 0, c = 0;
};

template <typename T>
class Image : public ImageBase
{
public:
    typedef std::shared_ptr<Image<T>> Ptr;
    typedef std::shared_ptr<Image<T> const> ConstPtr;
    typedef T ValueType;

    Image (void) = default;

    Image (int width, int height, int channels)
    {
        allocate(width, height, channels);
    }

    static Ptr create (void) { return Ptr(new Image<T>()); }

    static Ptr create (int width, int height, int channels)
    {
        return Ptr(new Image<T>(width, height, channels));
    }

    static Ptr create (Image<T> const& other)
    {
        return Ptr(new Image<T>(other));
    }

    void allocate (int width, int height, int channels)
    {
        w = width; h = height; c = channels;
        data.assign(std::size_t(width) * height * channels, T(0));
    }

    void resize (int width, int height, int channels)
    {
        w = width; h = height; c = channels;
        data.resize(std::size_t(width) * height * channels);
    }

    void fill (T const& value)
    {
        std::fill(data.begin(), data.end(), value);
    }

    Ptr duplicate (void) const
    {
        return Ptr(new Image<T>(*this));
    }

    /* value index (over w*h*c) */
    T const& at (std::size_t index) const { return data[index]; }
    T& at (std::size_t index) { return data[index]; }

    /* pixel index + channel */
    T const& at (std::size_t pixel, int channel) const
    {
        return data[pixel * c + channel];
    }
    T& at (std::size_t pixel, int channel)
    {
        return data[pixel * c + channel];
    }

    /* (x, y, channel) */
    T const& at (int x, int y, int channel) const
    {
        return data[(std::size_t(y) * w + x) * c + channel];
    }
    T& at (int x, int y, int channel)
    {
        return data[(std::size_t(y) * w + x) * c + channel];
    }

    T const& operator[] (std::size_t index) const { return data[index]; }
    T& operator[] (std::size_t index) { return data[index]; }

    /* Bilinear interpolation at float coords; x in [0, w-1], y in [0, h-1]
     * address pixel centers directly (MVE linear_at semantics). Fills one
     * value per channel into px. */
    void linear_at (float x, float y, T* px) const
    {
        x = std::max(0.0f, std::min(float(w - 1), x));
        y = std::max(0.0f, std::min(float(h - 1), y));
        int const x0 = std::min(int(x), w - 2 >= 0 ? w - 2 : 0);
        int const y0 = std::min(int(y), h - 2 >= 0 ? h - 2 : 0);
        int const x1 = std::min(x0 + 1, w - 1);
        int const y1 = std::min(y0 + 1, h - 1);
        float const fx = x - float(x0);
        float const fy = y - float(y0);
        for (int ch = 0; ch < c; ++ch)
        {
            float const v00 = float(at(x0, y0, ch));
            float const v10 = float(at(x1, y0, ch));
            float const v01 = float(at(x0, y1, ch));
            float const v11 = float(at(x1, y1, ch));
            px[ch] = T((v00 * (1.0f - fx) + v10 * fx) * (1.0f - fy)
                       + (v01 * (1.0f - fx) + v11 * fx) * fy);
        }
    }

    T linear_at (float x, float y, int64_t channel) const
    {
        x = std::max(0.0f, std::min(float(w - 1), x));
        y = std::max(0.0f, std::min(float(h - 1), y));
        int const x0 = std::min(int(x), w - 2 >= 0 ? w - 2 : 0);
        int const y0 = std::min(int(y), h - 2 >= 0 ? h - 2 : 0);
        int const x1 = std::min(x0 + 1, w - 1);
        int const y1 = std::min(y0 + 1, h - 1);
        float const fx = x - float(x0);
        float const fy = y - float(y0);
        float const v00 = float(at(x0, y0, channel));
        float const v10 = float(at(x1, y0, channel));
        float const v01 = float(at(x0, y1, channel));
        float const v11 = float(at(x1, y1, channel));
        return T((v00 * (1.0f - fx) + v10 * fx) * (1.0f - fy)
                 + (v01 * (1.0f - fx) + v11 * fx) * fy);
    }

    T* begin (void) { return data.data(); }
    T const* begin (void) const { return data.data(); }
    T* end (void) { return data.data() + data.size(); }
    T const* end (void) const { return data.data() + data.size(); }
    std::vector<T> const& get_data (void) const { return data; }
    std::vector<T>& get_data (void) { return data; }

private:
    std::vector<T> data;
};

typedef Image<uint8_t> ByteImage;
typedef Image<uint16_t> RawImage;
typedef Image<float> FloatImage;
typedef Image<double> DoubleImage;
typedef Image<int> IntImage;

}  // namespace mve

#endif /* MVE_IMAGE_STUB_HEADER */
