// Reference-baseline bench harness: drives the upstream NMSLIB core
// (built from /root/reference sources, ReleaseFast-equivalent flags) on
// the bench machine's CPU so BASELINE.md gets a *measured* reference
// column instead of a BLAS bound.
//
// Usage: bench_ref <data.bin> <n> <d> <nq> <space> <threads> <M> <efC> <k> <ef1,ef2,...> [napp <mt1,mt2,...>]
//   data.bin: float32 row-major, n corpus rows then nq query rows.
// Prints JSON lines: exact-scan QPS, hnsw build seconds, per-efSearch
// QPS + recall@k vs the exact scan. The optional trailing "napp"
// stage additionally builds pivot_neighb_invindx (numPivot=512,
// numPrefix=32 — matched to the tpu_knn NAPP arm) and sweeps the
// given query-time minTimes values.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <set>
#include <sstream>
#include <string>
#include <vector>

#include "init.h"
#include "index.h"
#include "knnquery.h"
#include "knnqueue.h"
#include "methodfactory.h"
#include "object.h"
#include "params.h"
#include "space.h"
#include "space/space_sparse_vector.h"
#include "space/space_vector.h"
#include "spacefactory.h"

using namespace similarity;

static double now_s() {
  using namespace std::chrono;
  return duration<double>(steady_clock::now().time_since_epoch()).count();
}

static std::vector<std::string> split_csv(const std::string& s) {
  std::vector<std::string> out;
  std::stringstream ss(s);
  std::string item;
  while (std::getline(ss, item, ',')) out.push_back(item);
  return out;
}

// Runs k-NN queries through an index, returns per-query result id sets
// and the elapsed seconds.
static double run_queries(const Space<float>& space, Index<float>* index,
                          const ObjectVector& queries, int k,
                          std::vector<std::vector<int>>* out_ids) {
  out_ids->assign(queries.size(), {});
  double t0 = now_s();
  for (size_t qi = 0; qi < queries.size(); ++qi) {
    KNNQuery<float> q(space, queries[qi], k);
    index->Search(&q, -1);
    std::unique_ptr<KNNQueue<float>> res(q.Result()->Clone());
    while (!res->Empty()) {
      (*out_ids)[qi].push_back(res->TopObject()->id());
      res->Pop();
    }
  }
  return now_s() - t0;
}

int main(int argc, char** argv) {
  if (argc < 11) {
    std::fprintf(stderr,
                 "usage: %s data.bin n d nq space threads M efC k efs\n",
                 argv[0]);
    return 2;
  }
  const char* path = argv[1];
  const long n = std::atol(argv[2]);
  const int d = std::atoi(argv[3]);
  const int nq = std::atoi(argv[4]);
  const std::string space_name = argv[5];
  const int threads = std::atoi(argv[6]);
  const int M = std::atoi(argv[7]);
  const int efC = std::atoi(argv[8]);
  const int k = std::atoi(argv[9]);
  const std::vector<std::string> efs = split_csv(argv[10]);

  initLibrary(0, LIB_LOGNONE, NULL);
  Space<float>* space =
      SpaceFactoryRegistry<float>::Instance().CreateSpace(space_name,
                                                          AnyParams());
  const bool sparse = space_name.find("sparse") != std::string::npos;

  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    return 2;
  }
  ObjectVector data, queries;
  data.reserve(n);
  if (sparse) {
    // sparse binary format: per row, int32 nnz then nnz x (int32 id,
    // float32 val), ids ascending (the reference's element contract)
    SpaceSparseVector<float>* ss =
        dynamic_cast<SpaceSparseVector<float>*>(space);
    if (!ss) {
      std::fprintf(stderr, "space %s is not a SpaceSparseVector\n",
                   space_name.c_str());
      return 2;
    }
    auto read_row = [&](IdType id) {
      int32_t nnz = 0;
      f.read(reinterpret_cast<char*>(&nnz), sizeof(nnz));
      std::vector<SparseVectElem<float>> elems(nnz);
      for (int32_t t = 0; t < nnz; ++t) {
        int32_t eid;
        float v;
        f.read(reinterpret_cast<char*>(&eid), sizeof(eid));
        f.read(reinterpret_cast<char*>(&v), sizeof(v));
        elems[t] = SparseVectElem<float>((uint32_t)eid, v);
      }
      return ss->CreateObjFromVect(id, -1, elems);
    };
    for (long i = 0; i < n; ++i) data.push_back(read_row((IdType)i));
    for (int i = 0; i < nq; ++i) queries.push_back(read_row((IdType)(n + i)));
  } else {
    VectorSpace<float>* vs = dynamic_cast<VectorSpace<float>*>(space);
    if (!vs) {
      std::fprintf(stderr, "space %s is not a VectorSpace\n",
                   space_name.c_str());
      return 2;
    }
    std::vector<float> row(d);
    for (long i = 0; i < n; ++i) {
      f.read(reinterpret_cast<char*>(row.data()), sizeof(float) * d);
      data.push_back(vs->CreateObjFromVect((IdType)i, -1,
                                           std::vector<float>(row.begin(), row.end())));
    }
    for (int i = 0; i < nq; ++i) {
      f.read(reinterpret_cast<char*>(row.data()), sizeof(float) * d);
      queries.push_back(vs->CreateObjFromVect((IdType)(n + i), -1,
                                              std::vector<float>(row.begin(), row.end())));
    }
  }
  if (!f) {
    std::fprintf(stderr, "short read from %s\n", path);
    return 2;
  }

  // ---- exact scan (brute_force) + gold standard -------------------
  Index<float>* seq = MethodFactoryRegistry<float>::Instance().CreateMethod(
      false, "brute_force", space_name, *space, data);
  seq->CreateIndex(AnyParams());
  std::vector<std::vector<int>> gold;
  double exact_s = run_queries(*space, seq, queries, k, &gold);
  std::printf("{\"metric\": \"ref_exact_qps\", \"value\": %.2f, \"n\": %ld}\n",
              nq / exact_s, n);
  std::fflush(stdout);

  // ---- hnsw -------------------------------------------------------
  Index<float>* hnsw = MethodFactoryRegistry<float>::Instance().CreateMethod(
      false, "hnsw", space_name, *space, data);
  std::vector<std::string> ip;
  ip.push_back("M=" + std::to_string(M));
  ip.push_back("efConstruction=" + std::to_string(efC));
  ip.push_back("indexThreadQty=" + std::to_string(threads));
  double tb = now_s();
  hnsw->CreateIndex(AnyParams(ip));
  double build_s = now_s() - tb;
  std::printf("{\"metric\": \"ref_hnsw_build_s\", \"value\": %.1f}\n", build_s);
  std::fflush(stdout);

  for (const std::string& ef : efs) {
    hnsw->SetQueryTimeParams(AnyParams({"efSearch=" + ef}));
    std::vector<std::vector<int>> ids;
    run_queries(*space, hnsw, queries, k, &ids);  // warm
    double dt = run_queries(*space, hnsw, queries, k, &ids);
    double rec = 0;
    for (int qi = 0; qi < nq; ++qi) {
      std::set<int> g(gold[qi].begin(), gold[qi].end());
      int hit = 0;
      for (int id : ids[qi]) hit += g.count(id);
      rec += double(hit) / double(k);
    }
    rec /= nq;
    std::printf(
        "{\"metric\": \"ref_hnsw\", \"efSearch\": %s, \"qps\": %.1f, "
        "\"recall\": %.4f}\n",
        ef.c_str(), nq / dt, rec);
    std::fflush(stdout);
  }

  // ---- napp (pivot_neighb_invindx), optional ----------------------
  if (argc >= 13 && std::string(argv[11]) == "napp") {
    const std::vector<std::string> mts = split_csv(argv[12]);
    Index<float>* napp = MethodFactoryRegistry<float>::Instance().CreateMethod(
        false, "napp", space_name, *space, data);
    std::vector<std::string> np;
    np.push_back("numPivot=512");
    np.push_back("numPrefix=32");
    np.push_back("indexThreadQty=" + std::to_string(threads));
    double tn = now_s();
    napp->CreateIndex(AnyParams(np));
    double napp_build_s = now_s() - tn;
    std::printf("{\"metric\": \"ref_napp_build_s\", \"value\": %.1f}\n",
                napp_build_s);
    std::fflush(stdout);
    for (const std::string& mt : mts) {
      napp->SetQueryTimeParams(AnyParams({"minTimes=" + mt}));
      std::vector<std::vector<int>> ids;
      run_queries(*space, napp, queries, k, &ids);  // warm
      double dt = run_queries(*space, napp, queries, k, &ids);
      double rec = 0;
      for (int qi = 0; qi < nq; ++qi) {
        std::set<int> g(gold[qi].begin(), gold[qi].end());
        int hit = 0;
        for (int id : ids[qi]) hit += g.count(id);
        rec += double(hit) / double(k);
      }
      rec /= nq;
      std::printf(
          "{\"metric\": \"ref_napp\", \"minTimes\": %s, \"qps\": %.1f, "
          "\"recall\": %.4f}\n",
          mt.c_str(), nq / dt, rec);
      std::fflush(stdout);
    }
  }
  return 0;
}
