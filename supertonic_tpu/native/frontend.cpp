// Native text frontend for supertonic_tpu.
//
// Character-exact C++17 twin of the Python frontend
// (supertonic_tpu/frontend/normalize.py, itself matching reference
// py/helper.py:16-131). This is the one truly native compute component of
// the reference outside ONNX Runtime (SURVEY.md §2.1: hand NFKD in
// cpp/helper.cpp:202-347) — here it exists so per-host feeders can
// normalize/tokenize at pod scale without the Python GIL.
//
// NFKD: generated table (nfkd_table.h, from Python's own unicodedata via
// gen_nfkd_table.py) + algorithmic Hangul decomposition (SBase 0xAC00,
// LBase 0x1100, VBase 0x1161, TBase 0x11A7 — same constants the reference
// uses, cpp/helper.cpp:202-211).
//
// Build: make -C supertonic_tpu/native   (produces libstpu_frontend.so)
// API (C ABI, ctypes-friendly):
//   int stpu_preprocess(const char* utf8, const char* lang,
//                       char* out, int out_cap);
//     -> bytes written, -1 invalid lang, -2 out_cap too small
//   long stpu_tokenize(const char* utf8, const long long* indexer,
//                      long table_len, long long* out_ids, long cap);
//     -> token count (one per codepoint), -2 cap too small

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "nfkd_table.h"

namespace {

using std::u32string;

// ---------------------------------------------------------------- UTF-8 ---
u32string DecodeUtf8(const char* s) {
  u32string out;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(s);
  while (*p) {
    uint32_t cp = 0;
    int extra = 0;
    if (*p < 0x80) {
      cp = *p;
    } else if ((*p >> 5) == 0x6) {
      cp = *p & 0x1F;
      extra = 1;
    } else if ((*p >> 4) == 0xE) {
      cp = *p & 0x0F;
      extra = 2;
    } else if ((*p >> 3) == 0x1E) {
      cp = *p & 0x07;
      extra = 3;
    } else {  // invalid byte: skip
      ++p;
      continue;
    }
    ++p;
    bool ok = true;
    for (int i = 0; i < extra; ++i, ++p) {
      if ((*p & 0xC0) != 0x80) {
        ok = false;
        break;
      }
      cp = (cp << 6) | (*p & 0x3F);
    }
    if (ok) out.push_back(cp);
  }
  return out;
}

void EncodeUtf8(const u32string& in, std::string* out) {
  out->clear();
  for (uint32_t cp : in) {
    if (cp < 0x80) {
      out->push_back(static_cast<char>(cp));
    } else if (cp < 0x800) {
      out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
      out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    } else if (cp < 0x10000) {
      out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
      out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
      out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    } else {
      out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
      out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
      out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
      out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    }
  }
}

// ----------------------------------------------------------------- NFKD ---
const char32_t* LookupNfkd(uint32_t cp) {
  int lo = 0, hi = kNfkdTableSize - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (kNfkdTable[mid].cp == cp) return kNfkdTable[mid].dec;
    if (kNfkdTable[mid].cp < cp)
      lo = mid + 1;
    else
      hi = mid - 1;
  }
  return nullptr;
}

void AppendNfkd(uint32_t cp, u32string* out) {
  // Hangul syllable: algorithmic decomposition to Jamo.
  constexpr uint32_t SBase = 0xAC00, LBase = 0x1100, VBase = 0x1161,
                     TBase = 0x11A7;
  constexpr uint32_t VCount = 21, TCount = 28, SCount = 11172;
  if (cp >= SBase && cp < SBase + SCount) {
    uint32_t idx = cp - SBase;
    out->push_back(LBase + idx / (VCount * TCount));
    out->push_back(VBase + (idx % (VCount * TCount)) / TCount);
    uint32_t t = idx % TCount;
    if (t) out->push_back(TBase + t);
    return;
  }
  if (const char32_t* dec = LookupNfkd(cp)) {
    for (const char32_t* p = dec; *p; ++p) out->push_back(*p);
    return;
  }
  out->push_back(cp);
}

uint8_t Ccc(uint32_t cp) {
  int lo = 0, hi = kCccTableSize - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (kCccTable[mid].cp == cp) return kCccTable[mid].ccc;
    if (kCccTable[mid].cp < cp)
      lo = mid + 1;
    else
      hi = mid - 1;
  }
  return 0;
}

// Canonical ordering (UAX #15): stable-sort adjacent nonzero-ccc marks by
// combining class. Python's unicodedata.normalize does this after
// decomposition; without it, stacked diacritics (possible in es/pt/fr
// input) tokenize differently here than in the Python frontend.
void CanonicalOrder(u32string* s) {
  size_t i = 1;
  while (i < s->size()) {
    uint8_t c = Ccc((*s)[i]);
    if (c != 0) {
      uint8_t prev = Ccc((*s)[i - 1]);
      if (prev > c) {
        std::swap((*s)[i - 1], (*s)[i]);
        if (i > 1) {
          --i;
          continue;
        }
      }
    }
    ++i;
  }
}

u32string Nfkd(const u32string& in) {
  u32string out;
  out.reserve(in.size() + 8);
  for (uint32_t cp : in) AppendNfkd(cp, &out);
  CanonicalOrder(&out);
  return out;
}

// -------------------------------------------------------------- helpers ---
bool IsEmoji(uint32_t cp) {
  // exact ranges of the reference emoji regex (py/helper.py:26-41)
  return (cp >= 0x1F600 && cp <= 0x1F64F) || (cp >= 0x1F300 && cp <= 0x1F5FF) ||
         (cp >= 0x1F680 && cp <= 0x1F6FF) || (cp >= 0x1F700 && cp <= 0x1F77F) ||
         (cp >= 0x1F780 && cp <= 0x1F7FF) || (cp >= 0x1F800 && cp <= 0x1F8FF) ||
         (cp >= 0x1F900 && cp <= 0x1F9FF) || (cp >= 0x1FA00 && cp <= 0x1FA6F) ||
         (cp >= 0x1FA70 && cp <= 0x1FAFF) || (cp >= 0x2600 && cp <= 0x26FF) ||
         (cp >= 0x2700 && cp <= 0x27BF) || (cp >= 0x1F1E6 && cp <= 0x1F1FF);
}

bool IsSpace(uint32_t cp) {
  // Python str \s on post-NFKD text (most exotic spaces already folded to
  // U+0020 by NFKD): ASCII whitespace + NEL + remaining unicode spaces.
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f' ||
         cp == '\v' || cp == 0x85 || cp == 0x1C || cp == 0x1D || cp == 0x1E ||
         cp == 0x1F || cp == 0x1680 || cp == 0x2028 || cp == 0x2029;
}

void ReplaceAll(u32string* s, const u32string& from, const u32string& to) {
  size_t pos = 0;
  while ((pos = s->find(from, pos)) != u32string::npos) {
    s->replace(pos, from.size(), to);
    pos += to.size();
  }
}

bool EndsWithTerminal(const u32string& s) {
  if (s.empty()) return false;
  static const u32string kTerminal =
      U".!?;:,'\")]}…。」』】〉》›»";
  return kTerminal.find(s.back()) != u32string::npos;
}

u32string Preprocess(const u32string& input, const std::string& lang) {
  // 1. NFKD (py/helper.py:23)
  u32string text = Nfkd(input);

  // 2. emoji strip (py/helper.py:26-41)
  {
    u32string tmp;
    tmp.reserve(text.size());
    for (uint32_t cp : text)
      if (!IsEmoji(cp)) tmp.push_back(cp);
    text.swap(tmp);
  }

  // 3. symbol replacements, in the reference's table order (py/helper.py:44-62)
  struct Rep {
    char32_t from;
    const char32_t* to;
  };
  static const Rep kReps[] = {
      {0x2013, U"-"}, {0x2011, U"-"}, {0x2014, U"-"}, {U'_', U" "},
      {0x201C, U"\""}, {0x201D, U"\""}, {0x2018, U"'"}, {0x2019, U"'"},
      {0x00B4, U"'"}, {U'`', U"'"}, {U'[', U" "}, {U']', U" "},
      {U'|', U" "}, {U'/', U" "}, {U'#', U" "}, {0x2192, U" "},
      {0x2190, U" "},
  };
  for (const auto& r : kReps)
    ReplaceAll(&text, u32string(1, r.from), r.to);

  // 4. special-symbol removal ♥☆♡©\ (py/helper.py:67)
  {
    u32string tmp;
    tmp.reserve(text.size());
    for (uint32_t cp : text)
      if (cp != 0x2665 && cp != 0x2606 && cp != 0x2661 && cp != 0x00A9 &&
          cp != U'\\')
        tmp.push_back(cp);
    text.swap(tmp);
  }

  // 5. expression expansion (py/helper.py:70-76)
  ReplaceAll(&text, U"@", U" at ");
  ReplaceAll(&text, U"e.g.,", U"for example, ");
  ReplaceAll(&text, U"i.e.,", U"that is, ");

  // 6. spacing fixes — single left-to-right pass per pattern, matching
  //    re.sub semantics (py/helper.py:79-85)
  for (char32_t punct : {U',', U'.', U'!', U'?', U';', U':', U'\''}) {
    u32string tmp;
    tmp.reserve(text.size());
    for (size_t i = 0; i < text.size(); ++i) {
      if (text[i] == U' ' && i + 1 < text.size() && text[i + 1] == punct) {
        tmp.push_back(punct);
        ++i;
      } else {
        tmp.push_back(text[i]);
      }
    }
    text.swap(tmp);
  }

  // 7. duplicate-quote collapse (py/helper.py:87-93)
  auto collapse = [&](const u32string& pair, const u32string& single) {
    while (text.find(pair) != u32string::npos) ReplaceAll(&text, pair, single);
  };
  collapse(U"\"\"", U"\"");
  collapse(U"''", U"'");
  collapse(U"``", U"`");

  // 8. whitespace collapse + strip (py/helper.py:96)
  {
    u32string tmp;
    bool in_space = false;
    for (uint32_t cp : text) {
      if (IsSpace(cp)) {
        in_space = true;
      } else {
        if (in_space && !tmp.empty()) tmp.push_back(U' ');
        in_space = false;
        tmp.push_back(cp);
      }
    }
    text.swap(tmp);
  }

  // 9. terminal punctuation guarantee (py/helper.py:99-100)
  if (!EndsWithTerminal(text)) text.push_back(U'.');

  // 10. language tag wrap (py/helper.py:102-104)
  u32string out;
  out.push_back(U'<');
  for (char c : lang) out.push_back(static_cast<char32_t>(c));
  out.push_back(U'>');
  out += text;
  out += U"</";
  for (char c : lang) out.push_back(static_cast<char32_t>(c));
  out.push_back(U'>');
  return out;
}

bool ValidLang(const std::string& lang) {
  return lang == "en" || lang == "ko" || lang == "es" || lang == "pt" ||
         lang == "fr";
}

}  // namespace

extern "C" {

int stpu_preprocess(const char* utf8, const char* lang_c, char* out,
                    int out_cap) {
  std::string lang(lang_c ? lang_c : "");
  if (!ValidLang(lang)) return -1;
  u32string processed = Preprocess(DecodeUtf8(utf8), lang);
  std::string encoded;
  EncodeUtf8(processed, &encoded);
  if (static_cast<int>(encoded.size()) + 1 > out_cap) return -2;
  std::memcpy(out, encoded.data(), encoded.size());
  out[encoded.size()] = '\0';
  return static_cast<int>(encoded.size());
}

long stpu_tokenize(const char* utf8, const long long* indexer, long table_len,
                   long long* out_ids, long cap) {
  u32string cps = DecodeUtf8(utf8);
  if (static_cast<long>(cps.size()) > cap) return -2;
  for (size_t i = 0; i < cps.size(); ++i) {
    uint32_t cp = cps[i];
    out_ids[i] = (cp < static_cast<uint32_t>(table_len)) ? indexer[cp] : 0;
  }
  return static_cast<long>(cps.size());
}

int stpu_version() { return 1; }

}  // extern "C"
