/* Baseline driver: runs the REFERENCE smvs depth pipeline (compiled
 * unmodified from /root/reference/lib against the minimal MVE-compatible
 * stubs in mve_stub/) on the same synthetic two-view scene bench.py
 * measures, single-threaded — the reference's per-view work unit
 * (`app/smvsrecon.cc:652-735` runs exactly one view per thread).
 *
 * Mirrors the app's per-view task: SGM init (scale 1, 128 steps, fixed
 * sweep range like bench.py) written as `smvs-sgm`, then
 * DepthOptimizer::optimize with bench.py's options
 * (regularization 0.01, 5 outer iterations, min_scale 2, use_sgm).
 *
 * Prints one JSON line with stage timings + accuracy.
 */

#include <chrono>
#include <cmath>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "mve/camera.h"
#include "mve/image.h"
#include "mve/view.h"

#include "depth_optimizer.h"
#include "sgm_stereo.h"
#include "stereo_view.h"

namespace {

double
now_sec (void)
{
    return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

mve::ByteImage::Ptr
load_img (std::string const& path)
{
    std::ifstream f(path, std::ios::binary);
    if (!f)
        throw std::runtime_error("cannot open " + path);
    int32_t w = 0, h = 0;
    f.read(reinterpret_cast<char*>(&w), 4);
    f.read(reinterpret_cast<char*>(&h), 4);
    mve::ByteImage::Ptr img = mve::ByteImage::create(w, h, 1);
    f.read(reinterpret_cast<char*>(img->begin()), std::size_t(w) * h);
    return img;
}

mve::CameraInfo
load_cam (std::string const& path)
{
    std::ifstream f(path);
    if (!f)
        throw std::runtime_error("cannot open " + path);
    mve::CameraInfo cam;
    f >> cam.flen;
    for (int i = 0; i < 9; ++i)
        f >> cam.rot[i];
    for (int i = 0; i < 3; ++i)
        f >> cam.trans[i];
    return cam;
}

std::vector<double>
load_gt (std::string const& path, int* w_out, int* h_out)
{
    std::ifstream f(path, std::ios::binary);
    if (!f)
        throw std::runtime_error("cannot open " + path);
    int32_t w = 0, h = 0;
    f.read(reinterpret_cast<char*>(&w), 4);
    f.read(reinterpret_cast<char*>(&h), 4);
    std::vector<double> gt(std::size_t(w) * h);
    f.read(reinterpret_cast<char*>(gt.data()), gt.size() * 8);
    *w_out = w;
    *h_out = h;
    return gt;
}

mve::View::Ptr
make_view (std::string const& dir, int id)
{
    mve::View::Ptr view = mve::View::create();
    view->set_id(id);
    view->set_camera(load_cam(dir + "/view" + std::to_string(id) + ".cam"));
    view->set_image(load_img(dir + "/view" + std::to_string(id) + ".img"),
        "undistorted");
    return view;
}

}  // namespace

int
main (int argc, char** argv)
{
    std::string const dir = argc > 1 ? argv[1] : "/tmp/smvs_baseline_scene";
    float const sgm_min = argc > 2 ? std::atof(argv[2]) : 3.5f;
    float const sgm_max = argc > 3 ? std::atof(argv[3]) : 9.5f;
    int const min_scale = argc > 4 ? std::atoi(argv[4]) : 2;

    mve::View::Ptr view_main = make_view(dir, 1);
    mve::View::Ptr view_sub = make_view(dir, 0);

    smvs::StereoView::Ptr main_view =
        smvs::StereoView::create(view_main, "undistorted");
    smvs::StereoView::Ptr sub_view =
        smvs::StereoView::create(view_sub, "undistorted");
    std::vector<smvs::StereoView::Ptr> sub_views = {sub_view};

    /* ---- SGM init (app/smvsrecon.cc:347-384 with bench.py's range) ---- */
    double const t0 = now_sec();
    smvs::SGMStereo::Options sgm_opts;
    sgm_opts.scale = argc > 6 ? std::atoi(argv[6]) : 1;
    sgm_opts.num_steps = 128;
    sgm_opts.min_depth = sgm_min;
    sgm_opts.max_depth = sgm_max;
    mve::FloatImage::Ptr sgm_depth =
        smvs::SGMStereo::reconstruct(sgm_opts, main_view, sub_view, nullptr);
    main_view->write_depth_to_view(sgm_depth, "smvs-sgm");
    double const t_sgm = now_sec() - t0;

    if (std::getenv("SMVS_BASELINE_DEBUG") != nullptr)
    {
        std::size_t nz = 0;
        double sum = 0.0;
        for (int p = 0; p < sgm_depth->get_pixel_amount(); ++p)
            if (sgm_depth->at(p) > 0.0f)
            {
                ++nz;
                sum += sgm_depth->at(p);
            }
        std::fprintf(stderr, "sgm: %dx%d nonzero=%zu (%.1f%%) mean=%.3f\n",
            sgm_depth->width(), sgm_depth->height(), nz,
            100.0 * nz / sgm_depth->get_pixel_amount(),
            nz ? sum / nz : 0.0);
        int gw2 = 0, gh2 = 0;
        std::vector<double> gt2 = load_gt(dir + "/gt1.bin", &gw2, &gh2);
        int const fx = gw2 / sgm_depth->width();
        std::vector<double> r2;
        for (int y = 0; y < sgm_depth->height(); ++y)
            for (int x = 0; x < sgm_depth->width(); ++x)
            {
                float const d = sgm_depth->at(x, y, 0);
                double const g = gt2[std::size_t(y) * fx * gw2 + x * fx];
                if (d > 0.0f && g > 0.0)
                    r2.push_back(std::abs(double(d) - g) / g);
            }
        std::sort(r2.begin(), r2.end());
        std::fprintf(stderr, "sgm med rel err vs gt: %.4f\n",
            r2.empty() ? -1.0 : r2[r2.size() / 2]);
    }

    /* ---- depth optimization (bench.py's OptimizerOptions) ---- */
    double const t1 = now_sec();
    smvs::DepthOptimizer::Options opts;
    opts.regularization = 0.01;
    opts.num_iterations = 5;
    opts.min_scale = min_scale;
    opts.use_sgm = true;
    opts.full_optimization = false;
    opts.debug_lvl = argc > 5 ? std::atoi(argv[5]) : 0;
    opts.output_name = "smvs-B0";
    smvs::DepthOptimizer optimizer(main_view, sub_views,
        mve::Bundle::ConstPtr(nullptr), opts);
    optimizer.optimize();
    mve::FloatImage::Ptr depth = optimizer.get_depth();
    double const t_opt = now_sec() - t1;

    /* ---- accuracy vs analytic ground truth ---- */
    int gw = 0, gh = 0;
    std::vector<double> gt = load_gt(dir + "/gt1.bin", &gw, &gh);
    std::vector<double> rel;
    std::size_t covered = 0;
    for (int p = 0; p < depth->get_pixel_amount(); ++p)
    {
        float const d = depth->at(p);
        if (d <= 0.0f)
            continue;
        ++covered;
        double const g = gt[p];
        if (g > 0.0)
            rel.push_back(std::abs(double(d) - g) / g);
    }
    std::sort(rel.begin(), rel.end());
    double const med = rel.empty() ? -1.0 : rel[rel.size() / 2];
    double const coverage =
        double(covered) / double(depth->get_pixel_amount());
    double const mp = double(depth->get_pixel_amount()) / 1e6;

    std::printf(
        "{\"w\": %d, \"h\": %d, \"t_sgm_s\": %.3f, \"t_opt_s\": %.3f, "
        "\"mp\": %.4f, \"mps_single_thread\": %.5f, \"coverage\": %.4f, "
        "\"median_rel_err\": %.6f}\n",
        depth->width(), depth->height(), t_sgm, t_opt, mp,
        mp / (t_sgm + t_opt), coverage, med);
    return 0;
}
