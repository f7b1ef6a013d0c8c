// jpegcoef.cpp — entropy-decode-only JPEG reader for the compressed
// device-side ingest path (lives_tpu/io/jpeg_ingest.py).
//
// Role: the host half of the split-decode pipeline. libjpeg's
// jpeg_read_coefficients() runs ONLY the Huffman/arithmetic entropy
// decode (cheap, one pass over the ~10-20x-compressed bitstream) and
// hands back the quantised DCT coefficient blocks; dequantisation, the
// 8x8 IDCT (batched matmuls on the MXU) and chroma upsampling all happen
// on the TPU. Succeeds the decoder-plugin host decode stage
// (reference lives-plugins/plugins/decoders/decplugin.h:280 get_frame)
// for MJPEG/JPEG media without shipping raw pixels over the tunnel.
//
// Layout notes (libjpeg internals): entropy decoding un-zigzags into
// natural (raster) order (jdhuff.c writes block[jpeg_natural_order[k]]),
// and quant_tbl_ptrs[]->quantval is natural order too — so both sides of
// the bridge speak raster-ordered 8x8 blocks and no zigzag tables are
// needed.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdlib>
#include <cstdint>
#include <cstring>

#if defined(__AVX512VBMI2__) && defined(__AVX512BW__)
#include <immintrin.h>
#define JC_HAVE_AVX512 1
#endif

namespace {

struct ErrMgr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void on_error(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Scalar sparse pack of one 64-coef block (the portable path, and the
// fallback for blocks containing |AC| > 127 escapes). Returns the
// nonzero-AC count, or -1 on ac/esc capacity overflow.
inline int pack_block_scalar(const JCOEF* blk, long long nb,
                             unsigned char* pos, signed char* vals,
                             long long& nac, long long ac_cap,
                             int* esc_idx, short* esc_val, int& nesc,
                             int esc_cap) {
  int cnt = 0;
  for (int k = 1; k < 64; k++) {
    JCOEF v = blk[k];
    if (!v) continue;
    if (nac >= ac_cap) return -1;
    pos[nac] = static_cast<unsigned char>(k);
    if (v > 127 || v < -127) {
      if (nesc >= esc_cap) return -1;
      esc_idx[nesc] = static_cast<int>(nb * 64 + k);
      esc_val[nesc] = v;
      nesc++;
      vals[nac] = v > 0 ? 127 : -127;
    } else {
      vals[nac] = static_cast<signed char>(v);
    }
    nac++;
    cnt++;
  }
  return cnt;
}

}  // namespace

extern "C" {

// info layout: [ncomp, image_h, image_w] + per component (up to 4):
//   [height_in_blocks, width_in_blocks, h_samp, v_samp, quant_tbl_no,
//    downsampled_width, downsampled_height]            (3 + 4*7 ints)
// qtabs: 4 tables x 64 uint16 (natural order; absent tables zeroed)
// coefs: concatenated per-component dense blocks, row-major blocks of 64
//   int16 each (natural order)
// returns: total int16 values written, -1 on decode error, -2 when
//   coef_cap is too small
long long jc_read(const unsigned char* buf, long long len, int* info,
                  unsigned short* qtabs, short* coefs,
                  long long coef_cap) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr* bar = jpeg_read_coefficients(&cinfo);
  if (!bar) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  info[0] = cinfo.num_components;
  info[1] = static_cast<int>(cinfo.image_height);
  info[2] = static_cast<int>(cinfo.image_width);
  for (int t = 0; t < 4; t++) {
    if (cinfo.quant_tbl_ptrs[t])
      memcpy(qtabs + t * 64, cinfo.quant_tbl_ptrs[t]->quantval,
             64 * sizeof(unsigned short));
    else
      memset(qtabs + t * 64, 0, 64 * sizeof(unsigned short));
  }
  long long off = 0;
  int ncomp = cinfo.num_components < 4 ? cinfo.num_components : 4;
  for (int c = 0; c < ncomp; c++) {
    jpeg_component_info* ci = cinfo.comp_info + c;
    int hb = static_cast<int>(ci->height_in_blocks);
    int wb = static_cast<int>(ci->width_in_blocks);
    int* ip = info + 3 + c * 7;
    ip[0] = hb;
    ip[1] = wb;
    ip[2] = ci->h_samp_factor;
    ip[3] = ci->v_samp_factor;
    ip[4] = ci->quant_tbl_no;
    ip[5] = static_cast<int>(ci->downsampled_width);
    ip[6] = static_cast<int>(ci->downsampled_height);
    if (off + static_cast<long long>(hb) * wb * 64 > coef_cap) {
      jpeg_destroy_decompress(&cinfo);
      return -2;
    }
    for (int r = 0; r < hb; r++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), bar[c],
          static_cast<JDIMENSION>(r), 1, FALSE);
      memcpy(coefs + off, rows[0][0], wb * 64 * sizeof(short));
      off += static_cast<long long>(wb) * 64;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return off;
}

// One-pass entropy decode + sparse pack (the v2 wire format of
// io/jpeg_ingest.py, emitted directly from the coefficient rows so the
// single host core skips a numpy repack):
//   dc[NB] int16, counts[NB] uint8 (nonzero-AC count, -1 on >255),
//   pos[C] uint8, vals[C] int8 (clamped), escapes (idx int32/val int16)
//   for |AC| > 127.
// info layout as jc_read. Returns the AC nonzero count, -1 decode error,
// -2 when ac_cap or esc_cap overflow (caller falls back to full decode).
long long jc_read_packed(const unsigned char* buf, long long len,
                         int* info, unsigned short* qtabs, short* dc,
                         unsigned char* counts, unsigned char* pos,
                         signed char* vals, long long ac_cap,
                         int* esc_idx, short* esc_val, int esc_cap,
                         int* esc_count, long long nb_cap) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr* bar = jpeg_read_coefficients(&cinfo);
  if (!bar) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  info[0] = cinfo.num_components;
  info[1] = static_cast<int>(cinfo.image_height);
  info[2] = static_cast<int>(cinfo.image_width);
  for (int t = 0; t < 4; t++) {
    if (cinfo.quant_tbl_ptrs[t])
      memcpy(qtabs + t * 64, cinfo.quant_tbl_ptrs[t]->quantval,
             64 * sizeof(unsigned short));
    else
      memset(qtabs + t * 64, 0, 64 * sizeof(unsigned short));
  }
  long long nb = 0, nac = 0;
  int nesc = 0;
  int ncomp = cinfo.num_components < 4 ? cinfo.num_components : 4;
  for (int c = 0; c < ncomp; c++) {
    jpeg_component_info* ci = cinfo.comp_info + c;
    int hb = static_cast<int>(ci->height_in_blocks);
    int wb = static_cast<int>(ci->width_in_blocks);
    int* ip = info + 3 + c * 7;
    ip[0] = hb;
    ip[1] = wb;
    ip[2] = ci->h_samp_factor;
    ip[3] = ci->v_samp_factor;
    ip[4] = ci->quant_tbl_no;
    ip[5] = static_cast<int>(ci->downsampled_width);
    ip[6] = static_cast<int>(ci->downsampled_height);
    for (int r = 0; r < hb; r++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), bar[c],
          static_cast<JDIMENSION>(r), 1, FALSE);
#ifdef JC_HAVE_AVX512
      // AVX-512 sparse pack (measured ~6x on the pack loop vs scalar on
      // the single host core): saturating int16->int8 pack of the whole
      // block, nonzero bitmask, VBMI2 compress-stores for positions and
      // values. Blocks with |AC| > 127 (rare) take the scalar path so
      // escape semantics stay byte-identical.
      const __m512i kperm = _mm512_set_epi64(7, 5, 3, 1, 6, 4, 2, 0);
      const __m512i kidx = _mm512_set_epi8(
          63, 62, 61, 60, 59, 58, 57, 56, 55, 54, 53, 52, 51, 50, 49, 48,
          47, 46, 45, 44, 43, 42, 41, 40, 39, 38, 37, 36, 35, 34, 33, 32,
          31, 30, 29, 28, 27, 26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 16,
          15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
      const __m512i khi = _mm512_set1_epi16(127);
      const __m512i klo = _mm512_set1_epi16(-127);
#endif
      for (int b = 0; b < wb; b++, nb++) {
        if (nb >= nb_cap) {            // geometry changed mid-stream
          jpeg_destroy_decompress(&cinfo);
          return -3;
        }
        const JCOEF* blk = rows[0][b];
        dc[nb] = blk[0];
        int cnt;
#ifdef JC_HAVE_AVX512
        static_assert(sizeof(JCOEF) == 2, "JCOEF must be int16");
        __m512i a = _mm512_loadu_si512(blk);       // coefs 0..31
        __m512i bb = _mm512_loadu_si512(blk + 32);  // coefs 32..63
        // DC (lane 0 of a) is carried separately as int16 and needs no
        // escape — mask it out, or bright/dark blocks (|DC|>127, e.g.
        // sky or black bars) would all fall back to the scalar loop
        __mmask32 esc = ((_mm512_cmpgt_epi16_mask(a, khi)
                          | _mm512_cmpgt_epi16_mask(klo, a))
                         & ~static_cast<__mmask32>(1))
            | _mm512_cmpgt_epi16_mask(bb, khi)
            | _mm512_cmpgt_epi16_mask(klo, bb);
        if (__builtin_expect(esc == 0, 1)) {
          // packs interleaves per 128-bit lane; the qword permute
          // restores block order 0..63
          __m512i p = _mm512_permutexvar_epi64(
              kperm, _mm512_packs_epi16(a, bb));
          __mmask64 nz = _mm512_test_epi8_mask(p, p)
              & ~static_cast<__mmask64>(1);  // drop the DC bit
          cnt = __builtin_popcountll(nz);
          if (nac + cnt > ac_cap) {
            jpeg_destroy_decompress(&cinfo);
            return -2;
          }
          _mm512_mask_compressstoreu_epi8(pos + nac, nz, kidx);
          _mm512_mask_compressstoreu_epi8(vals + nac, nz, p);
          nac += cnt;
        } else {
          cnt = pack_block_scalar(blk, nb, pos, vals, nac, ac_cap,
                                  esc_idx, esc_val, nesc, esc_cap);
        }
#else
        cnt = pack_block_scalar(blk, nb, pos, vals, nac, ac_cap,
                                esc_idx, esc_val, nesc, esc_cap);
#endif
        if (cnt < 0) {
          jpeg_destroy_decompress(&cinfo);
          return -2;
        }
        counts[nb] = static_cast<unsigned char>(cnt);
      }
    }
  }
  *esc_count = nesc;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return nac;
}

// Entropy ENCODE from the v2 sparse wire format (the reverse bridge:
// lives_tpu/io/jpeg_encode.py computes quantised DCT coefficients on the
// TPU and ships the sparse pack; this pass reconstructs dense blocks and
// runs only libjpeg's Huffman encode). Succeeds the reference's
// host-side JPEG writes (scrap frames / preview streams) without raw
// pixels crossing the tunnel.
//
// info layout: [ncomp, image_h, image_w] + per component (up to 4):
//   [height_in_blocks, width_in_blocks, h_samp, v_samp, quant_tbl_no]
//   (unpadded block dims, decode-side convention; MCU padding blocks are
//   zero-filled here)
// qtabs: 4 x 64 uint16, natural order (stored into quantval directly).
// Block stream: comp-major, row-major — dc[NB] i16, counts[NB] u8,
// pos/vals sparse ACs, escapes override by global index (nb*64+k).
// Returns bytes written into out, -1 on error, -2 when out_cap is small.
long long jc_write_packed(const int* info, const unsigned short* qtabs,
                          const short* dc, const unsigned char* counts,
                          const unsigned char* pos,
                          const signed char* vals, long long ac_len,
                          const int* esc_idx, const short* esc_val,
                          int nesc,
                          unsigned char* out, long long out_cap) {
  jpeg_compress_struct cinfo;
  ErrMgr jerr;
  unsigned char* obuf = nullptr;
  unsigned long osize = 0;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    if (obuf) free(obuf);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &obuf, &osize);

  int ncomp = info[0];
  cinfo.image_height = static_cast<JDIMENSION>(info[1]);
  cinfo.image_width = static_cast<JDIMENSION>(info[2]);
  cinfo.input_components = ncomp;
  cinfo.in_color_space = ncomp == 1 ? JCS_GRAYSCALE : JCS_YCbCr;
  jpeg_set_defaults(&cinfo);
  for (int t = 0; t < 4; t++) {
    bool any = false;
    for (int k = 0; k < 64; k++) any = any || qtabs[t * 64 + k];
    if (!any) continue;
    if (cinfo.quant_tbl_ptrs[t] == nullptr)
      cinfo.quant_tbl_ptrs[t] =
          jpeg_alloc_quant_table(reinterpret_cast<j_common_ptr>(&cinfo));
    memcpy(cinfo.quant_tbl_ptrs[t]->quantval, qtabs + t * 64,
           64 * sizeof(unsigned short));
    cinfo.quant_tbl_ptrs[t]->sent_table = FALSE;
  }
  for (int c = 0; c < ncomp; c++) {
    const int* ip = info + 3 + c * 7;
    cinfo.comp_info[c].h_samp_factor = ip[2];
    cinfo.comp_info[c].v_samp_factor = ip[3];
    cinfo.comp_info[c].quant_tbl_no = ip[4];
  }

  // padded virtual coefficient arrays (the MCU iteration reads
  // jround_up(dims, samp) blocks)
  jvirt_barray_ptr coef[4];
  for (int c = 0; c < ncomp; c++) {
    const int* ip = info + 3 + c * 7;
    int hs = ip[2], vs = ip[3];
    JDIMENSION wbp = static_cast<JDIMENSION>(((ip[1] + hs - 1) / hs) * hs);
    JDIMENSION hbp = static_cast<JDIMENSION>(((ip[0] + vs - 1) / vs) * vs);
    coef[c] = (cinfo.mem->request_virt_barray)(
        reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE, TRUE, wbp,
        hbp, static_cast<JDIMENSION>(vs));
  }
  jpeg_write_coefficients(&cinfo, coef);

  long long nb = 0, nac = 0;
  for (int c = 0; c < ncomp; c++) {
    const int* ip = info + 3 + c * 7;
    int hb = ip[0], wb = ip[1];
    int hs = ip[2], vs = ip[3];
    int wbp = ((wb + hs - 1) / hs) * hs;
    int hbp = ((hb + vs - 1) / vs) * vs;
    for (int r = 0; r < hbp; r++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), coef[c],
          static_cast<JDIMENSION>(r), 1, TRUE);
      memset(rows[0][0], 0, static_cast<size_t>(wbp) * 64 * sizeof(JCOEF));
      if (r >= hb) continue;  // zero padding row
      for (int b = 0; b < wb; b++, nb++) {
        JCOEF* blk = rows[0][b];
        blk[0] = dc[nb];
        int cnt = counts[nb];
        for (int k = 0; k < cnt && nac < ac_len; k++, nac++) {
          int p = pos[nac];
          if (p >= 1 && p < 64) blk[p] = vals[nac];
        }
      }
    }
  }
  // escapes carry the true value for |AC| > 127 (vals hold the clamp)
  for (int e = 0; e < nesc; e++) {
    long long gi = esc_idx[e];
    if (gi < 0) continue;
    long long tb = gi / 64;
    int k = static_cast<int>(gi % 64);
    // map global (unpadded) block index back to comp/row/col
    long long acc = 0;
    for (int c = 0; c < ncomp; c++) {
      const int* ip = info + 3 + c * 7;
      long long n = static_cast<long long>(ip[0]) * ip[1];
      if (tb < acc + n) {
        int wb = ip[1];
        long long lb = tb - acc;
        int r = static_cast<int>(lb / wb);
        int bcol = static_cast<int>(lb % wb);
        JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
            reinterpret_cast<j_common_ptr>(&cinfo), coef[c],
            static_cast<JDIMENSION>(r), 1, TRUE);
        rows[0][bcol][k] = esc_val[e];
        break;
      }
      acc += n;
    }
  }

  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  long long n = static_cast<long long>(osize);
  if (n > out_cap) {
    free(obuf);
    return -2;
  }
  memcpy(out, obuf, static_cast<size_t>(n));
  free(obuf);
  return n;
}

}  // extern "C"
