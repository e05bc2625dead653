/* Minimal MVE-compatible mve::CameraInfo for the baseline harness.
 *
 * Conventions verified against the reference's consumption sites
 * (`lib/surface.cc:103-122`, `lib/depth_optimizer.cc:680-699`,
 * `lib/stereo_view.h:102-148`) and mirrored by the TPU framework's
 * smvs_tpu/core/camera.py.
 */

#ifndef MVE_CAMERA_STUB_HEADER
#define MVE_CAMERA_STUB_HEADER

#include <algorithm>
#include <cmath>

namespace mve {

struct CameraInfo
{
    float flen = 0.0f;           /* focal length / max(width, height) */
    float paspect = 1.0f;        /* pixel aspect ratio */
    float ppoint[2] = {0.5f, 0.5f};
    float dist[2] = {0.0f, 0.0f};
    float trans[3] = {0.0f, 0.0f, 0.0f};
    float rot[9] = {1.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 1.0f};

    bool is_valid (void) const { return flen > 0.0f; }

    /* K for a width x height image (MVE fill_calibration semantics). */
    void fill_calibration (float* mat, int width, int height) const
    {
        float const dim_aspect = float(width) / float(height);
        float const image_aspect = dim_aspect * paspect;
        float ax, ay;
        if (image_aspect < 1.0f)  /* portrait */
        {
            ax = flen * height / paspect;
            ay = flen * height;
        }
        else
        {
            ax = flen * width;
            ay = flen * width * paspect;
        }
        mat[0] = ax;   mat[1] = 0.0f; mat[2] = width * ppoint[0];
        mat[3] = 0.0f; mat[4] = ay;   mat[5] = height * ppoint[1];
        mat[6] = 0.0f; mat[7] = 0.0f; mat[8] = 1.0f;
    }

    void fill_inverse_calibration (float* mat, int width, int height) const
    {
        float k[9];
        fill_calibration(k, width, height);
        mat[0] = 1.0f / k[0]; mat[1] = 0.0f;        mat[2] = -k[2] / k[0];
        mat[3] = 0.0f;        mat[4] = 1.0f / k[4]; mat[5] = -k[5] / k[4];
        mat[6] = 0.0f;        mat[7] = 0.0f;        mat[8] = 1.0f;
    }

    void fill_camera_pos (float* pos) const
    {
        /* -R^T t */
        for (int i = 0; i < 3; ++i)
            pos[i] = -(rot[0 + i] * trans[0] + rot[3 + i] * trans[1]
                       + rot[6 + i] * trans[2]);
    }

    void fill_viewing_direction (float* dir) const
    {
        for (int i = 0; i < 3; ++i)
            dir[i] = rot[6 + i];
    }

    /* Warp operator from this (source) view into `dest`: a source pixel
     * u = (x+0.5, y+0.5, 1) at z-depth w maps to h = w * M u + t; the
     * destination pixel is (h0/h2, h1/h2), destination z-depth h2. */
    void fill_reprojection (CameraInfo const& dest,
        int src_width, int src_height, int dst_width, int dst_height,
        float* mat, float* vec) const
    {
        float kd[9], ks_inv[9];
        dest.fill_calibration(kd, dst_width, dst_height);
        fill_inverse_calibration(ks_inv, src_width, src_height);

        /* R_rel = R_dst * R_src^T */
        float rrel[9];
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j)
            {
                float s = 0.0f;
                for (int k = 0; k < 3; ++k)
                    s += dest.rot[i * 3 + k] * rot[j * 3 + k];
                rrel[i * 3 + j] = s;
            }

        /* M = Kd * R_rel * Ks_inv */
        float tmp[9];
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j)
            {
                float s = 0.0f;
                for (int k = 0; k < 3; ++k)
                    s += rrel[i * 3 + k] * ks_inv[k * 3 + j];
                tmp[i * 3 + j] = s;
            }
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j)
            {
                float s = 0.0f;
                for (int k = 0; k < 3; ++k)
                    s += kd[i * 3 + k] * tmp[k * 3 + j];
                mat[i * 3 + j] = s;
            }

        /* t = Kd * (t_dst - R_rel * t_src) */
        float dt[3];
        for (int i = 0; i < 3; ++i)
        {
            float s = 0.0f;
            for (int k = 0; k < 3; ++k)
                s += rrel[i * 3 + k] * trans[k];
            dt[i] = dest.trans[i] - s;
        }
        for (int i = 0; i < 3; ++i)
            vec[i] = kd[i * 3 + 0] * dt[0] + kd[i * 3 + 1] * dt[1]
                + kd[i * 3 + 2] * dt[2];
    }
};

}  // namespace mve

#endif /* MVE_CAMERA_STUB_HEADER */
