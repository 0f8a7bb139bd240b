// Native host data plane for merfin_tpu.
//
// The reference keeps its sequence IO and output formatting in C++
// (dnaSeqFile/compressedFileWriter, utility submodule; consumed at
// merfin.C:38 and merfin-dump.C:92).  This library provides the same
// host-side speed for the TPU engine:
//   * FASTA/FASTQ parsing + 2-bit base encoding into uint8 code arrays
//     (A=0 C=1 G=2 T=3, other=4) in one pass,
//   * %.2f dump-row formatting (merfin-dump.C:92 format, zero-row skip).
//
// Exposed as a plain C ABI for ctypes.  Build: merfin_tpu/native/Makefile.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

static uint8_t CODE[256];

static void init_codes() {
  static bool done = false;
  if (done) return;
  memset(CODE, 4, sizeof(CODE));
  CODE[(int)'A'] = 0; CODE[(int)'a'] = 0;
  CODE[(int)'C'] = 1; CODE[(int)'c'] = 1;
  CODE[(int)'G'] = 2; CODE[(int)'g'] = 2;
  CODE[(int)'T'] = 3; CODE[(int)'t'] = 3;
  done = true;
}

// Parse FASTA/FASTQ bytes into encoded base codes.
//
// data/len   : whole (decompressed) file contents.
// out_codes  : caller buffer, capacity >= len; receives concatenated codes.
// out_offsets: caller int64 buffer, capacity max_seqs+1; receives
//              [start,end) offsets per sequence (offsets[0] == 0).
// Returns the sequence count, -1 on format error, -2 if > max_seqs.
int64_t mt_parse_seqs(const uint8_t* data, int64_t len,
                      uint8_t* out_codes, int64_t* out_offsets,
                      int64_t max_seqs) {
  init_codes();
  if (len == 0) return 0;
  const bool fastq = data[0] == '@';
  if (!fastq && data[0] != '>') return -1;

  int64_t nseq = 0, w = 0, i = 0;
  out_offsets[0] = 0;

  while (i < len) {
    const char h = (char)data[i];
    if (h == '\n' || h == '\r') { i++; continue; }
    if ((!fastq && h != '>') || (fastq && h != '@')) return -1;
    if (nseq >= max_seqs) return -2;
    while (i < len && data[i] != '\n') i++;   // skip header line
    i++;

    int64_t seq_start = w;
    if (!fastq) {
      while (i < len && data[i] != '>') {
        const uint8_t c = data[i++];
        if (c != '\n' && c != '\r') out_codes[w++] = CODE[c];
      }
    } else {
      while (i < len && data[i] != '\n') {    // single sequence line
        const uint8_t c = data[i++];
        if (c != '\r') out_codes[w++] = CODE[c];
      }
      i++;
      while (i < len && data[i] != '\n') i++; // '+' line
      i++;
      int64_t q = 0, need = w - seq_start;
      while (i < len && q < need) {           // quality chars
        const uint8_t c = data[i++];
        if (c != '\n' && c != '\r') q++;
      }
      while (i < len && (data[i] == '\n' || data[i] == '\r')) i++;
    }
    nseq++;
    out_offsets[nseq] = w;
  }
  return nseq;
}

// Extract NUL-separated idents (first word of each header) in order.
// Returns the name count, or -1 when out capacity is insufficient.
int64_t mt_parse_names(const uint8_t* data, int64_t len,
                       char* out, int64_t cap) {
  if (len == 0) return 0;
  const bool fastq = data[0] == '@';
  int64_t n = 0, w = 0, i = 0;

  while (i < len) {
    const char h = (char)data[i];
    if (h == '\n' || h == '\r') { i++; continue; }
    const bool is_header = (!fastq && h == '>') || (fastq && h == '@');
    if (is_header) {
      i++;
      while (i < len && data[i] != '\n' && data[i] != ' ' &&
             data[i] != '\t' && data[i] != '\r') {
        if (w + 2 >= cap) return -1;
        out[w++] = (char)data[i++];
      }
      out[w++] = '\0';
      n++;
      while (i < len && data[i] != '\n') i++;
      i++;
      if (!fastq) {
        while (i < len && data[i] != '>') i++;        // skip sequence
      } else {
        while (i < len && data[i] != '\n') i++;       // sequence line
        i++;
        while (i < len && data[i] != '\n') i++;       // '+' line
        i++;
        while (i < len && data[i] != '\n') i++;       // quality line
        i++;
      }
    } else {
      return -1;
    }
  }
  return n;
}

// Dump-row formatting (merfin-dump.C:87-93): "ident\tpos\t%.2f\t%.2f\t%.2f\n"
// for every position where any value is nonzero.  Returns bytes written,
// or -1 if out_cap is too small.
int64_t mt_format_dump_rows(const char* ident, int64_t start,
                            const double* read_k, const double* asm_k,
                            const double* km, int64_t n,
                            char* out, int64_t out_cap) {
  int64_t w = 0;
  const int64_t ident_len = (int64_t)strlen(ident);
  for (int64_t i = 0; i < n; i++) {
    if (read_k[i] == 0.0 && asm_k[i] == 0.0 && km[i] == 0.0) continue;
    if (w + ident_len + 96 > out_cap) return -1;
    memcpy(out + w, ident, ident_len);
    w += ident_len;
    w += snprintf(out + w, (size_t)(out_cap - w), "\t%lld\t%.2f\t%.2f\t%.2f\n",
                  (long long)(start + i), read_k[i], asm_k[i], km[i]);
  }
  return w;
}

}  // extern "C"
