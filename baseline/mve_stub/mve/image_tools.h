/* Minimal MVE-compatible mve::image tools for the baseline harness. */

#ifndef MVE_IMAGE_TOOLS_STUB_HEADER
#define MVE_IMAGE_TOOLS_STUB_HEADER

#include <cmath>
#include <stdexcept>

#include "mve/image.h"

namespace mve {
namespace image {

enum DesaturateType
{
    DESATURATE_MAXIMUM,
    DESATURATE_LIGHTNESS,
    DESATURATE_LUMINOSITY,
    DESATURATE_LUMINANCE,
    DESATURATE_AVERAGE
};

inline FloatImage::Ptr
byte_to_float_image (ByteImage::ConstPtr image)
{
    FloatImage::Ptr out = FloatImage::create(
        image->width(), image->height(), image->channels());
    for (int i = 0; i < image->get_value_amount(); ++i)
        out->at(i) = float(image->at(i)) / 255.0f;
    return out;
}

inline ByteImage::Ptr
float_to_byte_image (FloatImage::ConstPtr image,
    float vmin = 0.0f, float vmax = 1.0f)
{
    ByteImage::Ptr out = ByteImage::create(
        image->width(), image->height(), image->channels());
    for (int i = 0; i < image->get_value_amount(); ++i)
    {
        float v = (image->at(i) - vmin) / (vmax - vmin);
        v = std::max(0.0f, std::min(1.0f, v));
        out->at(i) = uint8_t(v * 255.0f + 0.5f);
    }
    return out;
}

/* Separable Gaussian blur; kernel radius ceil(sigma * 2.884) like MVE,
 * border handling by clamping. */
template <typename T>
typename Image<T>::Ptr
blur_gaussian (typename Image<T>::ConstPtr in, float sigma)
{
    int const w = in->width();
    int const h = in->height();
    int const c = in->channels();
    int const ks = int(std::ceil(sigma * 2.884f));
    std::vector<float> kernel(2 * ks + 1);
    float sum = 0.0f;
    for (int i = -ks; i <= ks; ++i)
    {
        kernel[i + ks] = math::gaussian(float(i), sigma);
        sum += kernel[i + ks];
    }
    for (auto& k : kernel)
        k /= sum;

    FloatImage tmp(w, h, c);
    /* horizontal */
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
            for (int ch = 0; ch < c; ++ch)
            {
                float acc = 0.0f;
                for (int i = -ks; i <= ks; ++i)
                {
                    int const xi = math::clamp(x + i, 0, w - 1);
                    acc += kernel[i + ks] * float(in->at(xi, y, ch));
                }
                tmp.at(x, y, ch) = acc;
            }
    typename Image<T>::Ptr out = Image<T>::create(w, h, c);
    /* vertical */
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
            for (int ch = 0; ch < c; ++ch)
            {
                float acc = 0.0f;
                for (int i = -ks; i <= ks; ++i)
                {
                    int const yi = math::clamp(y + i, 0, h - 1);
                    acc += kernel[i + ks] * tmp.at(x, yi, ch);
                }
                out->at(x, y, ch) = T(acc);
            }
    return out;
}

/* 2x2 box-average half-size rescale (MVE semantics: output (w+1)/2). */
template <typename T>
typename Image<T>::Ptr
rescale_half_size (typename Image<T>::ConstPtr in)
{
    int const w = in->width();
    int const h = in->height();
    int const c = in->channels();
    int const ow = (w + 1) >> 1;
    int const oh = (h + 1) >> 1;
    typename Image<T>::Ptr out = Image<T>::create(ow, oh, c);
    for (int y = 0; y < oh; ++y)
        for (int x = 0; x < ow; ++x)
        {
            int const x0 = 2 * x;
            int const y0 = 2 * y;
            int const x1 = std::min(x0 + 1, w - 1);
            int const y1 = std::min(y0 + 1, h - 1);
            for (int ch = 0; ch < c; ++ch)
            {
                float const acc = float(in->at(x0, y0, ch))
                    + float(in->at(x1, y0, ch))
                    + float(in->at(x0, y1, ch))
                    + float(in->at(x1, y1, ch));
                out->at(x, y, ch) = T(acc / 4.0f);
            }
        }
    return out;
}

template <typename T>
typename Image<T>::Ptr
desaturate (typename Image<T>::ConstPtr in, DesaturateType type)
{
    int const w = in->width();
    int const h = in->height();
    if (in->channels() < 3)
        throw std::invalid_argument("desaturate needs >= 3 channels");
    typename Image<T>::Ptr out = Image<T>::create(w, h, 1);
    for (int p = 0; p < in->get_pixel_amount(); ++p)
    {
        float const r = float(in->at(p, 0));
        float const g = float(in->at(p, 1));
        float const b = float(in->at(p, 2));
        float v;
        switch (type)
        {
            case DESATURATE_MAXIMUM:
                v = std::max(r, std::max(g, b));
                break;
            case DESATURATE_LIGHTNESS:
                v = 0.5f * (std::max(r, std::max(g, b))
                            + std::min(r, std::min(g, b)));
                break;
            case DESATURATE_LUMINOSITY:
                v = 0.21f * r + 0.72f * g + 0.07f * b;
                break;
            case DESATURATE_AVERAGE:
                v = (r + g + b) / 3.0f;
                break;
            case DESATURATE_LUMINANCE:
            default:
                v = 0.30f * r + 0.59f * g + 0.11f * b;
                break;
        }
        out->at(p, 0) = T(v);
    }
    return out;
}

template <typename T>
void
gamma_correct_inv_srgb (typename Image<T>::Ptr image)
{
    for (int i = 0; i < image->get_value_amount(); ++i)
    {
        float const v = float(image->at(i));
        image->at(i) = T(v <= 0.04045f
            ? v / 12.92f
            : std::pow((v + 0.055f) / 1.055f, 2.4f));
    }
}

}  // namespace image
}  // namespace mve

#endif /* MVE_IMAGE_TOOLS_STUB_HEADER */
