// Native 4-wide BVH builder over triangle AABBs.
//
// TPU-native-framework host component: replaces the reference's recursive
// pointer-based builder (/root/reference/shapes/BVHAccelerator.h:160-211)
// with an iterative, allocation-light builder that emits flattened SoA node
// arrays ready for device upload.  Used for large meshes (lucy-class, tens
// of millions of triangles) where the numpy builder's Python-level recursion
// is the bottleneck; the Python builder in scene/bvh.py remains as fallback.
//
// Topology: two levels of median split per node (widest centroid axis,
// nth_element partition) -> branching factor 4, leaves <= leaf_size.
// C ABI, called from Python via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BuildContext {
    const float* lo;        // [n,3]
    const float* hi;        // [n,3]
    std::vector<float> centroid;   // [n,3]
    std::vector<int32_t> order;    // permutation being built
    // output arrays (grow as nodes are allocated)
    std::vector<float> child_lo;   // [N,4,3]
    std::vector<float> child_hi;
    std::vector<int32_t> child_node;
    std::vector<int32_t> child_first;
    std::vector<int32_t> child_count;
    std::vector<int32_t> prim_order;
    int leaf_size;
};

int alloc_node(BuildContext& ctx) {
    const int id = static_cast<int>(ctx.child_node.size() / 4);
    for (int w = 0; w < 4; ++w) {
        for (int k = 0; k < 3; ++k) {
            ctx.child_lo.push_back(3.4e38f);
            ctx.child_hi.push_back(-3.4e38f);
        }
        ctx.child_node.push_back(-1);
        ctx.child_first.push_back(0);
        ctx.child_count.push_back(0);
    }
    return id;
}

// split [first, last) of ctx.order at the median of the widest centroid axis
int32_t* median_split(BuildContext& ctx, int32_t* first, int32_t* last) {
    float cmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float cmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int32_t* p = first; p != last; ++p) {
        const float* c = &ctx.centroid[static_cast<size_t>(*p) * 3];
        for (int k = 0; k < 3; ++k) {
            cmin[k] = std::min(cmin[k], c[k]);
            cmax[k] = std::max(cmax[k], c[k]);
        }
    }
    int axis = 0;
    float best = cmax[0] - cmin[0];
    for (int k = 1; k < 3; ++k) {
        const float e = cmax[k] - cmin[k];
        if (e > best) { best = e; axis = k; }
    }
    int32_t* mid = first + (last - first) / 2;
    std::nth_element(first, mid, last, [&ctx, axis](int32_t a, int32_t b) {
        return ctx.centroid[static_cast<size_t>(a) * 3 + axis]
             < ctx.centroid[static_cast<size_t>(b) * 3 + axis];
    });
    return mid;
}

struct WorkItem { int node; int32_t* first; int32_t* last; };

void fill_node(BuildContext& ctx, int node_id, int32_t* first, int32_t* last,
               std::vector<WorkItem>& stack) {
    // split into up to 4 groups
    int32_t* bounds[5];
    int ngroups = 0;
    const auto n = last - first;
    if (n <= 2) {
        for (long i = 0; i < n; ++i) { bounds[ngroups] = first + i; ++ngroups; }
        bounds[ngroups] = last;
    } else {
        int32_t* mid = median_split(ctx, first, last);
        int32_t* q1 = (mid - first > 1) ? median_split(ctx, first, mid) : first;
        int32_t* q3 = (last - mid > 1) ? median_split(ctx, mid, last) : mid;
        int32_t* cuts[5] = {first, q1, mid, q3, last};
        for (int i = 0; i < 4; ++i) {
            if (cuts[i + 1] - cuts[i] > 0) bounds[ngroups++] = cuts[i];
        }
        bounds[ngroups] = last;
    }

    for (int w = 0; w < ngroups; ++w) {
        int32_t* gfirst = bounds[w];
        int32_t* glast = bounds[w + 1];
        const size_t base = (static_cast<size_t>(node_id) * 4 + w) * 3;
        float blo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
        float bhi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
        for (int32_t* p = gfirst; p != glast; ++p) {
            const float* l = &ctx.lo[static_cast<size_t>(*p) * 3];
            const float* h = &ctx.hi[static_cast<size_t>(*p) * 3];
            for (int k = 0; k < 3; ++k) {
                blo[k] = std::min(blo[k], l[k]);
                bhi[k] = std::max(bhi[k], h[k]);
            }
        }
        std::memcpy(&ctx.child_lo[base], blo, sizeof blo);
        std::memcpy(&ctx.child_hi[base], bhi, sizeof bhi);

        const size_t slot = static_cast<size_t>(node_id) * 4 + w;
        if (glast - gfirst <= ctx.leaf_size) {
            ctx.child_first[slot] = static_cast<int32_t>(ctx.prim_order.size());
            ctx.child_count[slot] = static_cast<int32_t>(glast - gfirst);
            ctx.prim_order.insert(ctx.prim_order.end(), gfirst, glast);
        } else {
            const int cid = alloc_node(ctx);
            ctx.child_node[slot] = cid;
            stack.push_back({cid, gfirst, glast});
        }
    }
}

BuildContext* g_last = nullptr;

}  // namespace

extern "C" {

// Builds the BVH; returns number of nodes.  Call bvh_copy_out afterwards.
int32_t bvh_build(const float* lo, const float* hi, int32_t n, int32_t leaf_size) {
    delete g_last;
    auto* ctx = new BuildContext();
    g_last = ctx;
    ctx->lo = lo;
    ctx->hi = hi;
    ctx->leaf_size = leaf_size;
    ctx->centroid.resize(static_cast<size_t>(n) * 3);
    for (size_t i = 0; i < static_cast<size_t>(n) * 3; ++i) {
        ctx->centroid[i] = 0.5f * (lo[i] + hi[i]);
    }
    ctx->order.resize(n);
    for (int32_t i = 0; i < n; ++i) ctx->order[i] = i;
    ctx->prim_order.reserve(n);

    std::vector<WorkItem> stack;
    const int root = alloc_node(*ctx);
    fill_node(*ctx, root, ctx->order.data(), ctx->order.data() + n, stack);
    while (!stack.empty()) {
        WorkItem it = stack.back();
        stack.pop_back();
        fill_node(*ctx, it.node, it.first, it.last, stack);
    }
    return static_cast<int32_t>(ctx->child_node.size() / 4);
}

void bvh_copy_out(float* child_lo, float* child_hi, int32_t* child_node,
                  int32_t* child_first, int32_t* child_count,
                  int32_t* prim_order) {
    BuildContext* ctx = g_last;
    std::memcpy(child_lo, ctx->child_lo.data(), ctx->child_lo.size() * 4);
    std::memcpy(child_hi, ctx->child_hi.data(), ctx->child_hi.size() * 4);
    std::memcpy(child_node, ctx->child_node.data(), ctx->child_node.size() * 4);
    std::memcpy(child_first, ctx->child_first.data(), ctx->child_first.size() * 4);
    std::memcpy(child_count, ctx->child_count.data(), ctx->child_count.size() * 4);
    std::memcpy(prim_order, ctx->prim_order.data(), ctx->prim_order.size() * 4);
    delete ctx;
    g_last = nullptr;
}

}  // extern "C"
