// Native IO codecs: FASTQ batch parsing and SAM record formatting.
//
// TPU-native analog of the reference mapper's C++ sequence-IO layer
// (SURVEY.md §2.5 FASTQ reader, §2.12 SAM writer): the device pipeline
// consumes fixed-shape uint8 code blocks and produces per-read field
// arrays, so the host hot loops are (a) FASTQ text -> padded code batch
// and (b) field arrays -> SAM record text. Both are pure byte-crunching
// with no Python object churn; exposed as a C ABI for ctypes.
//
// Build: urmap_tpu/io/native/__init__.py shells out to g++ -O3 -shared.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <mutex>
#include <thread>
#include <vector>

#include <sys/mman.h>

namespace {

// char -> 2-bit code tables (alphabet.py: A=0 C=1 G=2 T/U=3, read N = 5)
constexpr uint8_t READ_N = 5;

struct CharTable {
  uint8_t t[256];
  CharTable() {
    memset(t, READ_N, sizeof(t));
    t[(int)'A'] = t[(int)'a'] = 0;
    t[(int)'C'] = t[(int)'c'] = 1;
    t[(int)'G'] = t[(int)'g'] = 2;
    t[(int)'T'] = t[(int)'t'] = 3;
    t[(int)'U'] = t[(int)'u'] = 3;
  }
};
const CharTable kCharTable;

const char kCodeToChar[6] = {'A', 'C', 'G', 'T', 'N', 'N'};
const char kCompChar[6] = {'T', 'G', 'C', 'A', 'N', 'N'};

inline const char* find_nl(const char* p, const char* end) {
  return static_cast<const char*>(memchr(p, '\n', end - p));
}

}  // namespace

extern "C" {

// Parse up to max_records FASTQ records from buf[0:n).
//
// Outputs (caller-allocated):
//   codes      uint8[max_records * max_len]   2-bit codes, READ_N padded
//   lengths    int32[max_records]             stored (truncated) length
//   name_off/name_len  int64/int32[max_records]  QNAME span in buf
//   seq_off/seq_len    int64/int32[max_records]  raw sequence span
//   qual_off           int64[max_records]        quality span (len==seq_len)
//
// Returns number of records parsed; *consumed is set to the byte offset
// just past the last complete record (resume point for the next chunk).
// A record is only emitted if all four of its lines are complete in buf.
// Returns -1 on malformed input (*consumed = offset of the bad record).
int64_t urmap_parse_fastq(const char* buf, int64_t n, int32_t max_len,
                          int64_t max_records, uint8_t* codes,
                          int32_t* lengths, int64_t* name_off,
                          int32_t* name_len, int64_t* seq_off,
                          int32_t* seq_len, int64_t* qual_off,
                          int64_t* consumed) {
  const char* p = buf;
  const char* end = buf + n;
  int64_t rec = 0;
  *consumed = 0;
  while (rec < max_records && p < end) {
    const char* rec_start = p;
    // @name line
    const char* l1 = find_nl(p, end);
    if (!l1) break;
    if (*p != '@') { *consumed = rec_start - buf; return -1; }
    const char* nm = p + 1;
    const char* nm_end = nm;
    while (nm_end < l1 && *nm_end != ' ' && *nm_end != '\t' &&
           *nm_end != '\r')
      ++nm_end;
    // strip /1 or /2 pair suffix (io/fastq.py convention)
    int32_t nlen = (int32_t)(nm_end - nm);
    if (nlen > 2 && nm_end[-2] == '/' &&
        (nm_end[-1] == '1' || nm_end[-1] == '2'))
      nlen -= 2;
    // sequence line
    const char* s = l1 + 1;
    const char* l2 = s < end ? find_nl(s, end) : nullptr;
    if (!l2) break;
    const char* sq_end = l2;
    if (sq_end > s && sq_end[-1] == '\r') --sq_end;
    // + line
    const char* pl = l2 + 1;
    const char* l3 = pl < end ? find_nl(pl, end) : nullptr;
    if (!l3) break;
    if (*pl != '+') { *consumed = rec_start - buf; return -1; }
    // quality line
    const char* q = l3 + 1;
    const char* l4 = q < end ? find_nl(q, end) : nullptr;
    const char* q_end;
    if (!l4) {
      // final record may lack trailing newline; require full quality run
      if (end - q < sq_end - s) break;
      q_end = q + (sq_end - s);
      p = end;
    } else {
      q_end = l4;
      if (q_end > q && q_end[-1] == '\r') --q_end;
      if (q_end - q != sq_end - s) { *consumed = rec_start - buf; return -1; }
      p = l4 + 1;
    }
    int64_t slen = sq_end - s;
    int32_t keep = slen < max_len ? (int32_t)slen : max_len;
    uint8_t* row = codes + rec * max_len;
    for (int32_t i = 0; i < keep; ++i)
      row[i] = kCharTable.t[(uint8_t)s[i]];
    if (keep < max_len) memset(row + keep, READ_N, max_len - keep);
    lengths[rec] = keep;
    name_off[rec] = nm - buf;
    name_len[rec] = nlen;
    seq_off[rec] = s - buf;
    seq_len[rec] = (int32_t)slen;
    qual_off[rec] = q - buf;
    *consumed = p - buf;
    ++rec;
  }
  return rec;
}

// Format one batch of SAM records into out (caller-allocated, cap bytes).
//
// Per-read inputs (arrays of length n):
//   flag int32; ref_id int32 (-1 => RNAME '*'); pos1 int64 (1-based);
//   mapq int32; mate_ref int32 / mate_pos1 int64 (-1/0 => '*'/0 fields,
//   -2 => '='); tlen int64; score int32 (AS tag; INT32_MIN => omit);
//   nm int32 (NM tag; <0 => omit); rev int32 (1 => emit seq/qual
//   reverse-complemented / reversed).
// Text inputs: the FASTQ buffer (for names/seq/qual via offsets), the
// concatenated CIGAR strings + offsets, and the concatenated reference
// label bytes + offsets (label i = labels[label_off[i]:label_off[i+1]]).
//
// Returns bytes written, or -1 if cap is too small (caller doubles).
int64_t urmap_format_sam(
    int64_t n, const char* fq, const int64_t* name_off,
    const int32_t* name_len, const int64_t* seq_off, const int32_t* seq_len,
    const int64_t* qual_off, const char* cig, const int64_t* cig_off,
    const char* labels, const int64_t* label_off, const int32_t* flag,
    const int32_t* ref_id, const int64_t* pos1, const int32_t* mapq,
    const int32_t* mate_ref, const int64_t* mate_pos1, const int64_t* tlen,
    const int32_t* score, const int32_t* nm, const int32_t* rev, char* out,
    int64_t cap) {
  char* o = out;
  char* oend = out + cap;
  for (int64_t i = 0; i < n; ++i) {
    int32_t slen = seq_len[i];
    // worst-case record bound: fixed fields ~ 96 + name + cigar + 2*seq
    // + the RNAME/RNEXT label bytes (memcpy'd unconditionally below)
    int64_t lab = 0;
    if (ref_id[i] >= 0) lab += label_off[ref_id[i] + 1] - label_off[ref_id[i]];
    if (mate_ref[i] >= 0)
      lab += label_off[mate_ref[i] + 1] - label_off[mate_ref[i]];
    int64_t need = 96 + name_len[i] + (cig_off[i + 1] - cig_off[i]) +
                   2 * (int64_t)slen + lab + 64;
    if (oend - o < need) return -1;
    // QNAME FLAG
    memcpy(o, fq + name_off[i], name_len[i]);
    o += name_len[i];
    *o++ = '\t';
    o += sprintf(o, "%d\t", flag[i]);
    // RNAME POS MAPQ
    if (ref_id[i] < 0) {
      *o++ = '*'; *o++ = '\t'; *o++ = '0'; *o++ = '\t';
      o += sprintf(o, "%d\t", mapq[i]);
    } else {
      int64_t lo = label_off[ref_id[i]], hi = label_off[ref_id[i] + 1];
      memcpy(o, labels + lo, hi - lo);
      o += hi - lo;
      *o++ = '\t';
      o += sprintf(o, "%lld\t%d\t", (long long)pos1[i], mapq[i]);
    }
    // CIGAR
    int64_t clo = cig_off[i], chi = cig_off[i + 1];
    if (chi > clo) {
      memcpy(o, cig + clo, chi - clo);
      o += chi - clo;
    } else {
      *o++ = '*';
    }
    *o++ = '\t';
    // RNEXT PNEXT TLEN
    if (mate_ref[i] == -2) {
      *o++ = '='; *o++ = '\t';
      o += sprintf(o, "%lld\t%lld\t", (long long)mate_pos1[i],
                   (long long)tlen[i]);
    } else if (mate_ref[i] < 0) {
      *o++ = '*'; *o++ = '\t'; *o++ = '0'; *o++ = '\t'; *o++ = '0';
      *o++ = '\t';
    } else {
      int64_t lo = label_off[mate_ref[i]], hi = label_off[mate_ref[i] + 1];
      memcpy(o, labels + lo, hi - lo);
      o += hi - lo;
      *o++ = '\t';
      o += sprintf(o, "%lld\t%lld\t", (long long)mate_pos1[i],
                   (long long)tlen[i]);
    }
    // SEQ QUAL ('*' when the record has no sequence, SAM v1.6)
    const char* s = fq + seq_off[i];
    const char* q = fq + qual_off[i];
    if (slen == 0) {
      *o++ = '*'; *o++ = '\t'; *o++ = '*';
    } else if (rev[i]) {
      for (int32_t j = slen - 1; j >= 0; --j)
        *o++ = kCompChar[kCharTable.t[(uint8_t)s[j]]];
      *o++ = '\t';
      for (int32_t j = slen - 1; j >= 0; --j) *o++ = q[j];
    } else {
      memcpy(o, s, slen);
      o += slen;
      *o++ = '\t';
      memcpy(o, q, slen);
      o += slen;
    }
    // tags
    if (score[i] != INT32_MIN) o += sprintf(o, "\tAS:i:%d", score[i]);
    if (nm[i] >= 0) o += sprintf(o, "\tNM:i:%d", nm[i]);
    *o++ = '\n';
  }
  return o - out;
}

// M-only CIGAR fast path: "{len}M" for every read; returns strings via
// the same concatenated-buffer convention. (Gapped reads overwrite their
// entry host-side before formatting.)
void urmap_cigars_all_match(int64_t n, const int32_t* lengths, char* cig,
                            int64_t* cig_off) {
  char* o = cig;
  cig_off[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    o += sprintf(o, "%dM", lengths[i]);
    cig_off[i + 1] = o - cig;
  }
}

// Compose the final per-batch CIGAR blob with zero per-read Python work:
//   unmapped            -> empty (formatter emits '*')
//   mapped, ungapped    -> "{len}M"
//   mapped, gapped      -> next entry of the traceback blob (tcig/tcig_off,
//                          one entry per mapped&gapped read, in row order)
// plus the truncation soft-clip for reads longer than the mapping length
// (leading for reverse-strand records, trailing for forward — the
// truncated tail of an rc record is emitted first; map/cigar.py).
// Returns total bytes, or -1 if cap is too small (caller doubles).
int64_t urmap_compose_cigars(
    int64_t n, const int32_t* lengths, const int32_t* raw_lengths,
    const uint8_t* mapped_gapped,  // 0 unmapped, 1 mapped M-only, 2 gapped
    const int32_t* strand, const char* tcig, const int64_t* tcig_off,
    char* out, int64_t cap, int64_t* out_off) {
  char* o = out;
  char* oend = out + cap;
  int64_t g = 0;
  out_off[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t mg = mapped_gapped[i];
    if (mg) {
      int64_t tlen = mg == 2 ? tcig_off[g + 1] - tcig_off[g] : 0;
      if (oend - o < 48 + tlen) return -1;
      int32_t extra = raw_lengths ? raw_lengths[i] - lengths[i] : 0;
      if (extra > 0 && strand[i]) o += sprintf(o, "%dS", extra);
      if (mg == 2) {
        memcpy(o, tcig + tcig_off[g], tlen);
        o += tlen;
        ++g;
      } else {
        o += sprintf(o, "%dM", lengths[i]);
      }
      if (extra > 0 && !strand[i]) o += sprintf(o, "%dS", extra);
    }
    out_off[i + 1] = o - out;
  }
  return o - out;
}

// Batched affine-gap traceback for the gapped minority (native twin of
// map/cigar.py traceback(): same recurrences, same tie-break order —
// diagonal M, then insertion E, then deletion F — same leading/trailing
// I -> S soft-clip rewrite, so CIGARs are byte-identical). The Python
// loop costs ~2.6 ms/read; this is ~50 us.
//
// Per read i: genome window starts at starts[i], width lengths[i]+pad
// (clamped to the genome end); read codes at reads + i*read_stride.
// Outputs: concatenated CIGARs (cig/cig_off[n+1]), nm (edit distance),
// score, ref span. Returns 0, or -1 if cig_cap was too small.
int64_t urmap_traceback_batch(
    const uint8_t* genome, int64_t G, const int64_t* starts,
    const uint8_t* reads, int64_t read_stride, const int32_t* lengths,
    int64_t n, int32_t pad, int32_t match, int32_t mismatch,
    int32_t gap_open, int32_t gap_ext, int32_t use_clip, int32_t clip_open,
    char* cig, int64_t cig_cap,
    int64_t* cig_off, int32_t* nm_out, int32_t* score_out,
    int32_t* span_out) {
  const int32_t NEGV = -(1 << 28);
  int32_t maxL = 0;
  for (int64_t i = 0; i < n; ++i)
    if (lengths[i] > maxL) maxL = lengths[i];
  int64_t W = (int64_t)maxL + pad + 1;   // max window cols + 1
  int64_t L1 = (int64_t)maxL + 1;
  int32_t* H = new int32_t[L1 * W];
  int32_t* E = new int32_t[L1 * W];
  int32_t* F = new int32_t[L1 * W];
  char* ops = new char[3 * (int64_t)maxL + pad + 4];

  char* o = cig;
  char* oend = cig + cig_cap;
  cig_off[0] = 0;
  int64_t rc = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t L = lengths[i];
    int64_t start = starts[i];
    int64_t Gw = (int64_t)L + pad;
    if (start < 0) start = 0;
    if (start + Gw > G) Gw = G - start;
    if (Gw < 0) Gw = 0;
    const uint8_t* g = genome + start;
    const uint8_t* r = reads + i * read_stride;
    int64_t w = Gw + 1;
    // init
    for (int64_t j = 0; j < w; ++j) { H[j] = NEGV; E[j] = NEGV; F[j] = NEGV; }
    H[0] = 0;
    for (int32_t ii = 1; ii <= L; ++ii) {
      int32_t* Hp = H + (int64_t)(ii - 1) * w;
      int32_t* Hc = H + (int64_t)ii * w;
      int32_t* Ep = E + (int64_t)(ii - 1) * w;
      int32_t* Ec = E + (int64_t)ii * w;
      int32_t* Fc = F + (int64_t)ii * w;
      int32_t e0 = Hp[0] + gap_open;
      int32_t e1 = Ep[0] + gap_ext;
      Ec[0] = e0 > e1 ? e0 : e1;
      Fc[0] = NEGV;
      Hc[0] = Ec[0];
      for (int64_t j = 1; j < w; ++j) {
        int32_t sub = (g[j - 1] == r[ii - 1]) ? match : mismatch;
        int32_t diag = Hp[j - 1] + sub;
        int32_t e = Hp[j] + gap_open;
        int32_t e2 = Ep[j] + gap_ext;
        Ec[j] = e > e2 ? e : e2;
        int32_t f = Hc[j - 1] + gap_open;
        int32_t f2 = Fc[j - 1] + gap_ext;
        Fc[j] = f > f2 ? f : f2;
        int32_t h = diag;
        if (Ec[j] > h) h = Ec[j];
        if (Fc[j] > h) h = Fc[j];
        Hc[j] = h;
      }
      // end-clip mode: inject the start-clip state (bases [0, ii)
      // soft-clipped, genome at POS) before the next row reads Hc
      if (use_clip && ii >= 1 && ii <= L - 1 && Hc[0] < clip_open)
        Hc[0] = clip_open;
    }
    // free end: best column in last row (ties -> smallest j, matching
    // numpy argmax)
    int32_t* HL = H + (int64_t)L * w;
    int64_t jend = 0;
    for (int64_t j = 1; j < w; ++j)
      if (HL[j] > HL[jend]) jend = j;
    int32_t score = HL[jend];
    int64_t iend = L;
    if (use_clip) {
      // early exit after row i (+one clip charge); j >= 1 so the
      // aligned segment is non-empty (matches map/cigar.py traceback)
      for (int64_t i2 = 1; i2 < L; ++i2) {
        int32_t* Hi = H + i2 * w;
        int64_t jb = 1;
        for (int64_t j = 2; j < w; ++j)
          if (Hi[j] > Hi[jb]) jb = j;
        if (Hi[jb] + clip_open > score) {
          score = Hi[jb] + clip_open;
          iend = i2;
          jend = jb;
        }
      }
    }

    // traceback (recompute decisions, python tie-break order)
    int64_t no = 0;
    int64_t ii = iend, j = jend;
    char state = 'H';
    while (ii > 0 || j > 0) {
      int32_t* Hc = H + ii * w;
      int32_t* Ec = E + ii * w;
      int32_t* Fc = F + ii * w;
      if (use_clip && state == 'H' && j == 0 && ii > 0 && ii < L &&
          Hc[0] == clip_open) {
        // start-clip entry: bases [0, ii) soft-clipped
        for (int64_t a = 0; a < ii; ++a) ops[no++] = 'S';
        ii = 0;
        break;
      }
      if (state == 'H') {
        if (ii > 0 && j > 0) {
          int32_t sub = (g[j - 1] == r[ii - 1]) ? match : mismatch;
          if (Hc[j] == H[(ii - 1) * w + (j - 1)] + sub) {
            ops[no++] = (g[j - 1] == r[ii - 1]) ? 'M' : 'X';
            --ii; --j;
            continue;
          }
        }
        if (ii > 0 && Hc[j] == Ec[j]) { state = 'E'; continue; }
        if (j > 0 && Hc[j] == Fc[j]) { state = 'F'; continue; }
        delete[] H; delete[] E; delete[] F; delete[] ops;
        return -2;  // traceback failed (should be impossible)
      } else if (state == 'E') {
        ops[no++] = 'I';
        if (H[(ii - 1) * w + j] + gap_open == Ec[j]) state = 'H';
        --ii;
      } else {
        ops[no++] = 'D';
        if (Hc[j - 1] + gap_open == Fc[j]) state = 'H';
        --j;
      }
    }
    // reverse
    for (int64_t a = 0, b = no - 1; a < b; ++a, --b) {
      char t = ops[a]; ops[a] = ops[b]; ops[b] = t;
    }
    if (use_clip && iend < L)                // end-clip: bases [iend, L)
      for (int64_t a = iend; a < L; ++a) ops[no++] = 'S';
    // leading/trailing I -> S
    int64_t s0 = 0, e0p = no;
    while (s0 < e0p && ops[s0] == 'I') ops[s0++] = 'S';
    while (e0p > s0 && ops[e0p - 1] == 'I') ops[--e0p] = 'S';
    int32_t nm = 0, span = 0;
    for (int64_t a = 0; a < no; ++a) {
      if (ops[a] == 'X' || ops[a] == 'I' || ops[a] == 'D') ++nm;
      if (ops[a] == 'M' || ops[a] == 'X' || ops[a] == 'D') ++span;
      if (ops[a] == 'X') ops[a] = 'M';
    }
    // run-length encode
    if (oend - o < 2 * no + 16) {
      delete[] H; delete[] E; delete[] F; delete[] ops;
      return -1;
    }
    int64_t a = 0;
    while (a < no) {
      int64_t b = a;
      while (b < no && ops[b] == ops[a]) ++b;
      o += sprintf(o, "%lld%c", (long long)(b - a), ops[a]);
      a = b;
    }
    cig_off[i + 1] = o - cig;
    nm_out[i] = nm;
    score_out[i] = score;
    span_out[i] = span;
    ++rc;
  }
  delete[] H; delete[] E; delete[] F; delete[] ops;
  return 0;
}

// Replay device traceback records ("dops", kernels/tb_dp.py): the
// device already WALKED its traceback bits and emitted one byte per
// read row — rec_i = d | (op << 6) at byte i%4 of word i//4, where op
// selects diag (M/X, host compares genome) vs insertion and d is the
// deletion-run length AFTER the op. Forward CIGAR = for i ascending:
// op_i then d_i 'D's. Byte-identical to urmap_traceback_batch /
// map/cigar.py traceback() for in-band paths (decode_dops_row is the
// Python reference twin). O(L) per read.
//
// dops: [nrows, ncols] int32 row-major (device matrix, lane stride
// ncols); read i uses column cols[i]. ok_out[i] = 0 marks a
// structural violation (caller falls back to the DP); its cigar entry
// is empty. Returns 0, or -1 if cig_cap was too small (caller doubles).
int64_t urmap_dops_decode_batch(
    const int32_t* dops, int64_t nrows, int64_t ncols, const int32_t* cols,
    const int32_t* lengths, const uint8_t* genome, int64_t G,
    const int64_t* starts, const uint8_t* reads, int64_t read_stride,
    int64_t n, char* cig, int64_t cig_cap, int64_t* cig_off,
    int32_t* nm_out, int32_t* span_out, uint8_t* ok_out) {
  char* o = cig;
  char* oend = cig + cig_cap;
  cig_off[0] = 0;
  int32_t maxL = 0;
  for (int64_t i = 0; i < n; ++i)
    if (lengths[i] > maxL) maxL = lengths[i];
  int64_t opcap = 64 * ((int64_t)maxL + 2);
  char* ops = new char[opcap];
  for (int64_t i = 0; i < n; ++i) {
    const int32_t L = lengths[i];
    const int64_t col = cols[i];
    const uint8_t* r = reads + i * read_stride;
    int64_t gi = starts[i];
    int64_t no = 0;
    bool ok = (col >= 0 && col < ncols && ((L + 3) >> 2) <= nrows);
    for (int32_t ii = 0; ok && ii < L; ++ii) {
      const int32_t rec =
          (dops[(int64_t)(ii >> 2) * ncols + col] >> (8 * (ii & 3))) &
          0xFF;
      const int32_t d = rec & 63;
      if ((rec >> 6) & 1) {
        ops[no++] = 'I';
      } else {
        if (gi < 0 || gi >= G) { ok = false; break; }
        ops[no++] = (genome[gi] == r[ii]) ? 'M' : 'X';
        ++gi;
      }
      if (d) {
        if (no + d > opcap) { ok = false; break; }
        for (int32_t a = 0; a < d; ++a) ops[no++] = 'D';
        gi += d;
        if (gi > G) { ok = false; break; }
      }
    }
    if (!ok) {
      ok_out[i] = 0;
      cig_off[i + 1] = o - cig;
      nm_out[i] = -1;
      span_out[i] = 0;
      continue;
    }
    // leading/trailing I -> S, nm/span, X -> M (same as traceback_batch)
    int64_t s0 = 0, e0p = no;
    while (s0 < e0p && ops[s0] == 'I') ops[s0++] = 'S';
    while (e0p > s0 && ops[e0p - 1] == 'I') ops[--e0p] = 'S';
    int32_t nm = 0, span = 0;
    for (int64_t a = 0; a < no; ++a) {
      if (ops[a] == 'X' || ops[a] == 'I' || ops[a] == 'D') ++nm;
      if (ops[a] == 'M' || ops[a] == 'X' || ops[a] == 'D') ++span;
      if (ops[a] == 'X') ops[a] = 'M';
    }
    if (oend - o < 2 * no + 16) {
      delete[] ops;
      return -1;
    }
    int64_t a = 0;
    while (a < no) {
      int64_t z = a;
      while (z < no && ops[z] == ops[a]) ++z;
      o += sprintf(o, "%lld%c", (long long)(z - a), ops[a]);
      a = z;
    }
    ok_out[i] = 1;
    cig_off[i + 1] = o - cig;
    nm_out[i] = nm;
    span_out[i] = span;
  }
  delete[] ops;
  return 0;
}

// Pack read codes for the H2D upload: 2-bit base plane (4 bases/byte)
// + 1-bit N plane (8 bases/byte). Single pass, word-at-a-time via the
// multiply-gather trick; bit-identical to genome_pack.pack_read_codes_host's
// numpy twin (unit-tested). The numpy version costs ~60 ms per 32k batch
// on the dispatch thread (GIL-contended multi-pass broadcasting) — this
// runs in ~2 ms with the GIL released (ctypes call).
// codes: uint8[B, L] row-major, values {0..3, 5}; packed: uint8[B, ceil(L/4)];
// nmask: uint8[B, ceil(L/8)].
void urmap_pack_reads(const uint8_t* codes, int64_t B, int64_t L,
                      uint8_t* packed, uint8_t* nmask) {
  const int64_t L4 = (L + 3) / 4, L8 = (L + 7) / 8;
  for (int64_t r = 0; r < B; ++r) {
    const uint8_t* row = codes + r * L;
    uint8_t* po = packed + r * L4;
    uint8_t* no = nmask + r * L8;
    memset(po, 0, (size_t)L4);
    memset(no, 0, (size_t)L8);
    int64_t j = 0;
    for (; j + 4 <= L; j += 4) {
      uint32_t w;
      memcpy(&w, row + j, 4);
      // gather the four 2-bit codes into one byte at bits 24..31
      po[j >> 2] =
          (uint8_t)(((w & 0x03030303u) * 0x01041040u) >> 24);
      // bit 2 of each code marks N (codes 4/5); gather 4 bits
      uint32_t nb = (w >> 2) & 0x01010101u;
      no[j >> 3] |= (uint8_t)((((nb * 0x01020408u) >> 24) & 0xFu)
                              << (j & 4));
    }
    for (; j < L; ++j) {
      uint8_t c = row[j];
      po[j >> 2] |= (uint8_t)((c & 3) << ((j & 3) * 2));
      no[j >> 3] |= (uint8_t)(((c >> 2) & 1) << (j & 7));
    }
  }
}

// Greedy no-straddle CSR run placement (index/store.py row-aligned
// device tables): given per-run entry counts (each <= rw), choose new
// start offsets so no run crosses an rw-word row boundary — the map
// step's positions gather then needs ceil(p/rw) aligned rows per seed
// instead of one extra straddle row. Sequential recurrence (the pad
// decision depends on the running fill), so it lives here: ~16M runs
// is milliseconds in C vs seconds in Python. Returns the padded total.
int64_t urmap_align_runs(const int64_t* counts, int64_t n, int64_t rw,
                         int64_t* starts) {
  // granularity per run = next_pow2(count): runs stay inside one
  // g-word block, so narrow tiered gathers (seed.gather_candidates)
  // and the full rw-row gather both see span-1 fetches. rw bounds g.
  (void)rw;
  int64_t cur = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t c = counts[i];
    int64_t g = 1;
    while (g < c) g <<= 1;
    const int64_t rem = g - (cur & (g - 1));
    if (c > rem) cur += rem;
    starts[i] = cur;
    cur += c;
  }
  return cur;
}

// Fixed-granularity variant: runs must only avoid crossing a FIXED
// g-word boundary (the "row128" huge-table layout, index/store.py —
// the TPU fetches one dense g-lane row per seed, so pow2 nesting is
// unnecessary and its pad cost unaffordable at >2^31 entries). Pad is
// ~(mean_run-1)/g, a few % for capped runs vs g=128.
int64_t urmap_align_runs_fixed(const int64_t* counts, int64_t n,
                               int64_t g, int64_t* starts) {
  int64_t cur = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t c = counts[i];
    const int64_t rem = g - (cur & (g - 1));
    if (c > rem) cur += rem;
    starts[i] = cur;
    cur += c;
  }
  return cur;
}

}  // extern "C"

// -------------------- UFI index-build kernels --------------------
//
// Native twins of the host index-build hot loops (index/build.py): k-mer
// word extraction + lossy slot hashing (hashing.extract_words_np /
// hash_words_np, bit-identical) fused with the disk-spill radix partition,
// and an LSD radix sort for the per-bucket (slot<<32|pos) keys. The
// reference's builder is a two-pass counting sort over the genome
// (SURVEY.md §3.1); this is the same classic shape, multithreaded.
// ctypes releases the GIL around these calls, so index/build.py also runs
// urmap_sort_u64 over several buckets concurrently from Python threads.

namespace {

// Grow-only mmap-backed scratch. Page-fault cost on this class of VM is
// ~5-20 s per fresh GB for anon-private pages but ~1 s/GB for shared
// ones with MADV_HUGEPAGE, and malloc munmaps gigabyte buffers on free —
// so repeated per-chunk scratch would re-fault its pages on every call.
// Keep the scratch alive and reuse it.
struct Scratch {
  void* p = nullptr;
  size_t cap = 0;
  ~Scratch() {
    if (p) munmap(p, cap);
  }
  void* get(size_t n) {
    if (n <= cap) return p;
    if (p) munmap(p, cap);
    size_t need = (n + ((size_t)2 << 20) - 1) & ~(((size_t)2 << 20) - 1);
    p = mmap(nullptr, need, PROT_READ | PROT_WRITE,
             MAP_SHARED | MAP_ANONYMOUS, -1, 0);
    if (p == MAP_FAILED) {
      p = nullptr;
      cap = 0;
      return nullptr;
    }
    madvise(p, need, MADV_HUGEPAGE);
    cap = need;
    return p;
  }
};

Scratch g_extract_scratch;         // guarded by g_extract_mu
std::mutex g_extract_mu;
thread_local Scratch t_sort_scratch;

// hashing.hash_words_np twin (murmur3 fmix32-style avalanche).
inline uint32_t fmix_hash(uint32_t lo, uint32_t hi) {
  uint32_t h = lo * 0x9E3779B1u;
  h ^= hi * 0x85EBCA6Bu;
  h ^= h >> 16;
  h *= 0x7FEB352Du;
  h ^= h >> 15;
  h *= 0x846CA68Bu;
  h ^= h >> 16;
  return h;
}

struct ExtractShard {
  const uint8_t* codes;
  int64_t w0, w1;          // word-start range [w0, w1)
  int64_t base_pos;
  int32_t k, slot_bits, radix_shift;
  uint64_t* scratch;       // phase-1 keys land at scratch[w0 + j]
  int64_t n_emitted;       // valid words in [w0, w1)
  std::vector<int64_t> hist;  // per-bucket counts
};

// Phase 1: rolling k-window over the shard's word range. The (hi, lo)
// split matches extract_words_np: lo = last min(k,16) bases, hi = the
// earlier k-16 (2 bits per base, first base most significant). The
// rolling update feeds each new base into lo and spills lo's top base
// into hi, with masks truncating to the exact widths the from-scratch
// build produces.
void extract_shard(ExtractShard* s) {
  const int32_t k = s->k;
  const int32_t lo_bases = k < 16 ? k : 16;
  const uint32_t lo_mask =
      k >= 16 ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1u);
  const int32_t hi_bits = 2 * (k - lo_bases);
  const uint32_t hi_mask =
      hi_bits <= 0 ? 0u
                   : (hi_bits >= 32 ? 0xFFFFFFFFu : ((1u << hi_bits) - 1u));
  const uint32_t slot_mask = (s->slot_bits >= 32)
                                 ? 0xFFFFFFFFu
                                 : ((1u << s->slot_bits) - 1u);
  const int32_t lo_top = 2 * (lo_bases - 1);
  const uint8_t* codes = s->codes;
  uint64_t* out = s->scratch + s->w0;
  int64_t n_out = 0;
  uint32_t lo = 0, hi = 0;
  int64_t last_bad = s->w0 - 1;
  // Prime the first window's k-1 leading bases.
  for (int64_t j = s->w0; j < s->w0 + k - 1; ++j) {
    const uint8_t c = codes[j];
    if (c >= 4) last_bad = j;
    hi = ((hi << 2) | (lo >> lo_top)) & hi_mask;
    lo = ((lo << 2) | (c & 3u)) & lo_mask;
  }
  for (int64_t i = s->w0; i < s->w1; ++i) {
    const uint8_t c = codes[i + k - 1];
    if (c >= 4) last_bad = i + k - 1;
    hi = ((hi << 2) | (lo >> lo_top)) & hi_mask;
    lo = ((lo << 2) | (c & 3u)) & lo_mask;
    if (last_bad < i) {
      const uint32_t slot = fmix_hash(lo, hi) & slot_mask;
      ++s->hist[slot >> s->radix_shift];
      out[n_out++] =
          ((uint64_t)slot << 32) | (uint32_t)(s->base_pos + i);
    }
  }
  s->n_emitted = n_out;
}

struct ScatterShard {
  const uint64_t* scratch;
  int64_t s0, n;           // this shard's phase-1 keys
  int32_t bucket_shift;    // 32 + radix_shift
  uint64_t* key_out;
  std::vector<int64_t> cursor;  // per-bucket write positions
};

void scatter_shard(ScatterShard* s) {
  for (int64_t j = 0; j < s->n; ++j) {
    const uint64_t key = s->scratch[s->s0 + j];
    s->key_out[s->cursor[key >> s->bucket_shift]++] = key;
  }
}

}  // namespace

extern "C" {

// Extract all k-mer words of codes[0:n_codes), hash to slot_bits-bit
// slots, and emit (slot << 32 | pos) uint64 keys PARTITIONED by bucket
// (= slot >> radix_shift, ascending; arbitrary order within a bucket —
// the caller fully sorts each bucket later). pos = base_pos + word index.
// Words containing a code >= 4 (N) are dropped. Multithreaded.
//
//   key_out        uint64[n_codes - k + 1] capacity; first <return> used
//   bucket_counts  int64[1 << (slot_bits - radix_shift)] out
//
// Returns the number of valid words emitted, or -1 on bad args / OOM.
int64_t urmap_extract_partition(const uint8_t* codes, int64_t n_codes,
                                int64_t base_pos, int32_t k,
                                int32_t slot_bits, int32_t radix_shift,
                                int32_t n_threads, uint64_t* key_out,
                                int64_t* bucket_counts) {
  const int64_t n_words = n_codes - k + 1;
  if (k < 1 || k > 32 || n_words <= 0 || radix_shift < 0 ||
      radix_shift > slot_bits || slot_bits < 1 || slot_bits > 32)
    return -1;
  const int32_t nbuck_bits = slot_bits - radix_shift;
  if (nbuck_bits > 16) return -1;
  const int64_t nbuck = 1ll << nbuck_bits;
  int64_t t = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
  if (n_words < (1 << 20)) t = 1;
  std::lock_guard<std::mutex> lk(g_extract_mu);
  uint64_t* scratch = static_cast<uint64_t*>(
      g_extract_scratch.get((size_t)n_words * sizeof(uint64_t)));
  if (!scratch) return -1;

  std::vector<ExtractShard> shards(t);
  const int64_t per = (n_words + t - 1) / t;
  for (int64_t i = 0; i < t; ++i) {
    ExtractShard& s = shards[i];
    s.codes = codes;
    s.w0 = i * per;
    s.w1 = (i + 1) * per < n_words ? (i + 1) * per : n_words;
    s.base_pos = base_pos;
    s.k = k;
    s.slot_bits = slot_bits;
    s.radix_shift = radix_shift;
    s.scratch = scratch;
    s.n_emitted = 0;
    s.hist.assign(nbuck, 0);
  }
  {
    std::vector<std::thread> pool;
    for (int64_t i = 1; i < t; ++i)
      pool.emplace_back(extract_shard, &shards[i]);
    extract_shard(&shards[0]);
    for (auto& th : pool) th.join();
  }
  // Global bucket totals, then per-(bucket, thread) write cursors.
  int64_t total = 0;
  for (int64_t b = 0; b < nbuck; ++b) {
    int64_t c = 0;
    for (int64_t i = 0; i < t; ++i) c += shards[i].hist[b];
    bucket_counts[b] = c;
    total += c;
  }
  std::vector<ScatterShard> sc(t);
  {
    std::vector<int64_t> base(nbuck, 0);
    int64_t run = 0;
    for (int64_t b = 0; b < nbuck; ++b) {
      base[b] = run;
      run += bucket_counts[b];
    }
    for (int64_t i = 0; i < t; ++i) {
      sc[i].scratch = scratch;
      sc[i].s0 = shards[i].w0;
      sc[i].n = shards[i].n_emitted;
      sc[i].bucket_shift = 32 + radix_shift;
      sc[i].key_out = key_out;
      sc[i].cursor.assign(nbuck, 0);
      for (int64_t b = 0; b < nbuck; ++b) {
        sc[i].cursor[b] = base[b];
        base[b] += shards[i].hist[b];
      }
    }
  }
  {
    std::vector<std::thread> pool;
    for (int64_t i = 1; i < t; ++i)
      pool.emplace_back(scatter_shard, &sc[i]);
    scatter_shard(&sc[0]);
    for (auto& th : pool) th.join();
  }
  return total;
}

// Evenly-subsampled CSR recap (store.UfiIndex.recapped twin): for every
// slot, copy its positions run capped to <= cap entries, kept ranks
// ceil(m*c/cap) for m in [0, cap) — identical selection to
// store.evenly_cap_runs. new_offsets must hold the capped CSR offsets
// (numpy: cumsum(min(counts, cap))). Slots are sharded over threads;
// each output run's location is fully determined by new_offsets, so the
// fill is embarrassingly parallel. Returns 0.
int32_t urmap_recap(const uint32_t* offsets, int64_t n_slots,
                    const uint32_t* positions, int64_t cap,
                    int32_t n_threads, const uint32_t* new_offsets,
                    uint32_t* new_positions) {
  int64_t t = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
  if (n_slots < (1 << 16)) t = 1;
  const int64_t per = (n_slots + t - 1) / t;
  auto work = [&](int64_t s0, int64_t s1) {
    for (int64_t s = s0; s < s1; ++s) {
      const int64_t lo = offsets[s], hi = offsets[s + 1];
      const int64_t c = hi - lo;
      uint32_t* out = new_positions + new_offsets[s];
      if (c <= cap) {
        for (int64_t j = 0; j < c; ++j) out[j] = positions[lo + j];
      } else {
        for (int64_t m = 0; m < cap; ++m)
          out[m] = positions[lo + (m * c + cap - 1) / cap];
      }
    }
  };
  std::vector<std::thread> pool;
  for (int64_t i = 1; i < t; ++i) {
    const int64_t s0 = i * per;
    const int64_t s1 = (i + 1) * per < n_slots ? (i + 1) * per : n_slots;
    if (s0 < s1) pool.emplace_back(work, s0, s1);
  }
  work(0, per < n_slots ? per : n_slots);
  for (auto& th : pool) th.join();
  return 0;
}

// Row-aligned CSR placement (store._tables_np aligned-layout twin):
// copy each slot's positions run to out[starts[s] ...] as biased int32
// (pos - pos_bias). out must be prefilled with the pad sentinel. The
// destination of every run is independent, so slots shard over threads.
int32_t urmap_place_runs(const uint32_t* offsets, int64_t n_slots,
                         const uint32_t* positions, const int64_t* starts,
                         int64_t pos_bias, int32_t n_threads,
                         int32_t* out) {
  int64_t t = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
  if (n_slots < (1 << 16)) t = 1;
  const int64_t per = (n_slots + t - 1) / t;
  auto work = [&](int64_t s0, int64_t s1) {
    for (int64_t s = s0; s < s1; ++s) {
      const int64_t lo = offsets[s], hi = offsets[s + 1];
      int32_t* dst = out + starts[s];
      for (int64_t j = lo; j < hi; ++j)
        dst[j - lo] = (int32_t)((int64_t)positions[j] - pos_bias);
    }
  };
  std::vector<std::thread> pool;
  for (int64_t i = 1; i < t; ++i) {
    const int64_t s0 = i * per;
    const int64_t s1 = (i + 1) * per < n_slots ? (i + 1) * per : n_slots;
    if (s0 < s1) pool.emplace_back(work, s0, s1);
  }
  work(0, per < n_slots ? per : n_slots);
  for (auto& th : pool) th.join();
  return 0;
}

// FASTA text -> concatenated genome codes (io/fasta.py SeqDB layout):
// [sep][seq0][sep][seq1][sep]... with sep = sep_len bases of genome-N
// (code 4). Whitespace inside bodies is skipped; other bytes encode via
// the genome table (A/C/G/T/U case-insensitive, everything else -> 4) —
// byte-identical to alphabet.encode(is_genome=True) after the Python
// path's bytes.translate whitespace strip. Headers are returned as byte
// spans into buf (caller decodes + takes the first token).
// Returns the record count, or -1 (data before first header) /
// -2 (empty header) / -3 (more than max_records). *codes_len gets the
// total code length written.
int64_t urmap_parse_fasta(const char* buf, int64_t n, int64_t sep_len,
                          int64_t max_records, uint8_t* codes,
                          int64_t* seq_start, int64_t* seq_len,
                          int64_t* head_off, int64_t* head_len,
                          int64_t* codes_len) {
  static const struct GenomeTable {
    uint8_t t[256];
    GenomeTable() {
      memset(t, 4, sizeof(t));
      t[(int)'A'] = t[(int)'a'] = 0;
      t[(int)'C'] = t[(int)'c'] = 1;
      t[(int)'G'] = t[(int)'g'] = 2;
      t[(int)'T'] = t[(int)'t'] = 3;
      t[(int)'U'] = t[(int)'u'] = 3;
    }
  } kGenome;
  int64_t i = 0;
  while (i < n && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r' ||
                   buf[i] == '\n'))
    ++i;
  if (i >= n || buf[i] != '>') return -1;
  int64_t w = 0;
  for (int64_t s = 0; s < sep_len; ++s) codes[w++] = 4;
  int64_t nrec = 0;
  while (i < n) {
    // at '>': header runs to end of line
    ++i;
    const char* nl = static_cast<const char*>(
        memchr(buf + i, '\n', (size_t)(n - i)));
    int64_t hend = nl ? (nl - buf) : n;
    int64_t hlo = i, hhi = hend;
    while (hlo < hhi && (buf[hlo] == ' ' || buf[hlo] == '\t' ||
                         buf[hlo] == '\r'))
      ++hlo;
    while (hhi > hlo && (buf[hhi - 1] == ' ' || buf[hhi - 1] == '\t' ||
                         buf[hhi - 1] == '\r'))
      --hhi;
    if (hhi == hlo) return -2;
    if (nrec >= max_records) return -3;
    head_off[nrec] = hlo;
    head_len[nrec] = hhi - hlo;
    i = hend + 1;
    const int64_t body_w = w;
    // a record starts only at a LINE-START '>' (the Python path splits
    // on "\n>"); a mid-line '>' is sequence data (encodes to 4)
    bool line_start = true;
    while (i < n && !(line_start && buf[i] == '>')) {
      const char c = buf[i++];
      line_start = (c == '\n');
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') continue;
      codes[w++] = kGenome.t[(uint8_t)c];
    }
    seq_start[nrec] = body_w;
    seq_len[nrec] = w - body_w;
    for (int64_t s = 0; s < sep_len; ++s) codes[w++] = 4;
    ++nrec;
  }
  *codes_len = w;
  return nrec;
}

// One spill bucket -> capped CSR, single pass over the SORTED keys
// ((slot<<32)|pos ascending): for each slot run, copy its positions
// (low 32 bits) capped to <= cap with the even-subsample ranks
// ceil(m*c/cap) (identical selection to urmap_recap / evenly_cap_runs),
// and record the capped run length. counts_out must hold sps (slots per
// bucket) entries; slot_lo is the bucket's first slot id. Returns the
// number of positions written to pos_out.
int64_t urmap_bucket_csr(const uint64_t* keys, int64_t n, int64_t slot_lo,
                         int64_t sps, int64_t cap, uint32_t* pos_out,
                         int64_t* counts_out) {
  memset(counts_out, 0, (size_t)sps * sizeof(int64_t));
  int64_t w = 0;
  int64_t i = 0;
  while (i < n) {
    const uint64_t slot = keys[i] >> 32;
    int64_t j = i + 1;
    while (j < n && (keys[j] >> 32) == slot) ++j;
    const int64_t c = j - i;
    const int64_t rel = (int64_t)slot - slot_lo;
    if (rel < 0 || rel >= sps) return -1;
    if (cap <= 0 || c <= cap) {
      for (int64_t q = i; q < j; ++q) pos_out[w++] = (uint32_t)keys[q];
      counts_out[rel] = c;
    } else {
      for (int64_t m = 0; m < cap; ++m)
        pos_out[w++] = (uint32_t)keys[i + (m * c + cap - 1) / cap];
      counts_out[rel] = cap;
    }
    i = j;
  }
  return w;
}

// Capped CSR offsets: new_offsets[s+1]-new_offsets[s] =
// min(offsets[s+1]-offsets[s], cap). Returns the MAX uncapped run
// length (callers skip the whole recap when it's <= cap). Two-phase
// parallel prefix over slot shards.
int64_t urmap_cap_offsets(const uint32_t* offsets, int64_t n_slots,
                          int64_t cap, int32_t n_threads,
                          uint32_t* new_offsets) {
  int64_t t = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
  if (n_slots < (1 << 18)) t = 1;
  const int64_t per = (n_slots + t - 1) / t;
  std::vector<int64_t> totals(t, 0), maxes(t, 0);
  auto phase1 = [&](int64_t ti) {
    const int64_t s0 = ti * per;
    const int64_t s1 = (ti + 1) * per < n_slots ? (ti + 1) * per : n_slots;
    int64_t tot = 0, mx = 0;
    for (int64_t s = s0; s < s1; ++s) {
      const int64_t c = (int64_t)offsets[s + 1] - offsets[s];
      if (c > mx) mx = c;
      tot += c < cap ? c : cap;
    }
    totals[ti] = tot;
    maxes[ti] = mx;
  };
  {
    std::vector<std::thread> pool;
    for (int64_t i = 1; i < t; ++i) pool.emplace_back(phase1, i);
    phase1(0);
    for (auto& th : pool) th.join();
  }
  std::vector<int64_t> base(t, 0);
  int64_t run = 0, mx = 0;
  for (int64_t i = 0; i < t; ++i) {
    base[i] = run;
    run += totals[i];
    if (maxes[i] > mx) mx = maxes[i];
  }
  auto phase2 = [&](int64_t ti) {
    const int64_t s0 = ti * per;
    const int64_t s1 = (ti + 1) * per < n_slots ? (ti + 1) * per : n_slots;
    int64_t acc = base[ti];
    for (int64_t s = s0; s < s1; ++s) {
      const int64_t c = (int64_t)offsets[s + 1] - offsets[s];
      acc += c < cap ? c : cap;
      new_offsets[s + 1] = (uint32_t)acc;
    }
  };
  new_offsets[0] = 0;
  {
    std::vector<std::thread> pool;
    for (int64_t i = 1; i < t; ++i) pool.emplace_back(phase2, i);
    phase2(0);
    for (auto& th : pool) th.join();
  }
  return mx;
}

// 2-bit genome packing (genome_pack.pack_genome core loop twin): word w
// = OR of (code&3) << 2i over its 16 bases (base i in lane 2i); nplane
// gets 01 in the lane when the code is N (>= 4). The trailing partial
// word is padded with N. Parallel over word ranges. out_stride lets the
// caller pass views into the final INTERLEAVED (code, N) table —
// packed = &inter[2*WORD_PAD], nplane = &inter[2*WORD_PAD + 1],
// out_stride = 2 — so the planes are written in place, no concatenate
// or interleave copies of the multi-GB table.
int32_t urmap_pack_genome(const uint8_t* codes, int64_t n,
                          int32_t n_threads, uint32_t* packed,
                          uint32_t* nplane, int64_t out_stride) {
  const int64_t W = (n + 15) / 16;
  int64_t t = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
  if (W < (1 << 18)) t = 1;
  const int64_t per = (W + t - 1) / t;
  auto work = [&](int64_t w0, int64_t w1) {
    for (int64_t w = w0; w < w1; ++w) {
      uint32_t pk = 0, np_ = 0;
      const int64_t b0 = w * 16;
      for (int64_t i = 0; i < 16; ++i) {
        const uint8_t c = (b0 + i < n) ? codes[b0 + i] : (uint8_t)4;
        pk |= (uint32_t)(c & 3) << (2 * i);
        np_ |= (uint32_t)(c >= 4 ? 1 : 0) << (2 * i);
      }
      packed[w * out_stride] = pk;
      nplane[w * out_stride] = np_;
    }
  };
  std::vector<std::thread> pool;
  for (int64_t i = 1; i < t; ++i) {
    const int64_t w0 = i * per;
    const int64_t w1 = (i + 1) * per < W ? (i + 1) * per : W;
    if (w0 < w1) pool.emplace_back(work, w0, w1);
  }
  work(0, per < W ? per : W);
  for (auto& th : pool) th.join();
  return 0;
}

// In-place LSD radix sort of uint64 keys (4 x 16-bit digit passes).
// Keys are unique (positions are), so any full sort matches numpy's
// stable sort bit-for-bit. Returns 0, or -1 on OOM.
int32_t urmap_sort_u64(uint64_t* keys, int64_t n) {
  if (n <= 1) return 0;
  uint64_t* tmp = static_cast<uint64_t*>(
      t_sort_scratch.get((size_t)n * sizeof(uint64_t)));
  if (!tmp) return -1;
  uint64_t* src = keys;
  uint64_t* dst = tmp;
  std::vector<int64_t> hist(1 << 16);
  for (int pass = 0; pass < 4; ++pass) {
    const int shift = 16 * pass;
    std::fill(hist.begin(), hist.end(), 0);
    for (int64_t i = 0; i < n; ++i)
      ++hist[(src[i] >> shift) & 0xFFFF];
    int64_t run = 0;
    for (int64_t d = 0; d < (1 << 16); ++d) {
      const int64_t c = hist[d];
      hist[d] = run;
      run += c;
    }
    for (int64_t i = 0; i < n; ++i)
      dst[hist[(src[i] >> shift) & 0xFFFF]++] = src[i];
    uint64_t* t2 = src;
    src = dst;
    dst = t2;
  }
  // 4 passes: src == keys again (even number of swaps).
  return 0;
}

}  // extern "C"
