// Ogg/Vorbis decoder via the system libvorbisfile (dlopen, stable ABI).
//
// Decodes the ogg/vorbis byte streams stored inside dataset HDF5 files
// (`codec=vorbis` root attribute; the reference uses the lewton crate).
// Memory-backed ov_open_callbacks so no temp files are needed.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <dlfcn.h>

namespace dfdata {

// --- minimal libvorbisfile ABI declarations (stable since 2002) ------------

typedef struct {
  size_t (*read_func)(void*, size_t, size_t, void*);
  int (*seek_func)(void*, int64_t, int);
  int (*close_func)(void*);
  long (*tell_func)(void*);
} ov_callbacks_t;

// OggVorbis_File is large; allocate a generous opaque blob.
struct OggVorbisFileBlob {
  unsigned char opaque[2048];
};

struct vorbis_info_t {
  int version;
  int channels;
  long rate;
  // ... (truncated; only the fields above are read)
};

typedef int (*ov_open_callbacks_fn)(void*, OggVorbisFileBlob*, const char*, long,
                                    ov_callbacks_t);
typedef long (*ov_read_fn)(OggVorbisFileBlob*, char*, int, int, int, int, int*);
typedef vorbis_info_t* (*ov_info_fn)(OggVorbisFileBlob*, int);
typedef int (*ov_clear_fn)(OggVorbisFileBlob*);

struct MemStream {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

static size_t mem_read(void* ptr, size_t size, size_t nmemb, void* src) {
  MemStream* m = (MemStream*)src;
  size_t want = size * nmemb;
  size_t have = m->size - m->pos;
  if (want > have) want = have;
  memcpy(ptr, m->data + m->pos, want);
  m->pos += want;
  return size ? want / size : 0;
}

static int mem_seek(void* src, int64_t offset, int whence) {
  MemStream* m = (MemStream*)src;
  int64_t target;
  switch (whence) {
    case SEEK_SET: target = offset; break;
    case SEEK_CUR: target = (int64_t)m->pos + offset; break;
    case SEEK_END: target = (int64_t)m->size + offset; break;
    default: return -1;
  }
  if (target < 0 || target > (int64_t)m->size) return -1;
  m->pos = (size_t)target;
  return 0;
}

static long mem_tell(void* src) { return (long)((MemStream*)src)->pos; }

struct VorbisLib {
  void* handle = nullptr;
  ov_open_callbacks_fn open_cb = nullptr;
  ov_read_fn read = nullptr;
  ov_info_fn info = nullptr;
  ov_clear_fn clear = nullptr;
};

static VorbisLib* get_vorbis_lib() {
  static VorbisLib lib;
  static bool tried = false;
  if (!tried) {
    tried = true;
    lib.handle = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_GLOBAL);
    if (!lib.handle) lib.handle = dlopen("libvorbisfile.so", RTLD_NOW | RTLD_GLOBAL);
    if (lib.handle) {
      lib.open_cb = (ov_open_callbacks_fn)dlsym(lib.handle, "ov_open_callbacks");
      lib.read = (ov_read_fn)dlsym(lib.handle, "ov_read");
      lib.info = (ov_info_fn)dlsym(lib.handle, "ov_info");
      lib.clear = (ov_clear_fn)dlsym(lib.handle, "ov_clear");
    }
  }
  return lib.open_cb && lib.read && lib.info && lib.clear ? &lib : nullptr;
}

// Decode whole stream to interleaved int16 little-endian. Returns frames
// decoded (samples per channel), -1 on error, -2 if libvorbisfile missing.
int64_t decode_vorbis(const uint8_t* data, size_t size, int16_t* out,
                      int64_t max_frames, int* channels_out, int* sr_out) {
  VorbisLib* lib = get_vorbis_lib();
  if (!lib) return -2;
  MemStream mem{data, size, 0};
  OggVorbisFileBlob vf;
  ov_callbacks_t cbs{mem_read, mem_seek, nullptr, mem_tell};
  if (lib->open_cb(&mem, &vf, nullptr, 0, cbs) < 0) return -1;
  vorbis_info_t* vi = lib->info(&vf, -1);
  if (!vi || vi->channels <= 0) {
    lib->clear(&vf);
    return -1;
  }
  int channels = vi->channels;
  *channels_out = channels;
  *sr_out = (int)vi->rate;
  int64_t frames_done = 0;
  int bitstream = 0;
  while (frames_done < max_frames) {
    int64_t want_bytes = (max_frames - frames_done) * channels * 2;
    if (want_bytes > 65536) want_bytes = 65536;
    long n = lib->read(&vf, (char*)(out + frames_done * channels),
                       (int)want_bytes, 0 /*LE*/, 2 /*16-bit*/, 1 /*signed*/,
                       &bitstream);
    if (n <= 0) break;  // EOF or error
    frames_done += n / (channels * 2);
  }
  lib->clear(&vf);
  return frames_done;
}

}  // namespace dfdata
