/*
 * sonLib shim implementation (C++ behind a C ABI — the reference already
 * links -lstdc++, /root/reference/include.mk:133).  Semantics follow the
 * reference's call sites, documented per function; deterministic choices
 * for implementation-defined behavior are flagged SHIM-CHOICE.
 */

#include "sonLib.h"
#include "bioioC.h"

#include <algorithm>
#include <cctype>
#include <cstdarg>
#include <cstring>
#include <set>
#include <string>
#include <sys/stat.h>
#include <dirent.h>
#include <unordered_map>
#include <vector>

/* ============================== memory ============================== */

extern "C" void *st_malloc(size_t size) {
    void *p = malloc(size == 0 ? 1 : size);
    if (p == NULL) st_errAbort("st_malloc of %zu bytes failed", size);
    return p;
}

extern "C" void *st_calloc(int64_t num, size_t size) {
    void *p = calloc(num == 0 ? 1 : (size_t)num, size == 0 ? 1 : size);
    if (p == NULL) st_errAbort("st_calloc of %lld x %zu failed",
                               (long long)num, size);
    return p;
}

/* ============================== logging ============================= */

static int64_t g_log_level = critical;

extern "C" void st_setLogLevelFromString(const char *level) {
    if (level == NULL) { g_log_level = critical; return; }
    std::string s;
    for (const char *c = level; *c; ++c) s.push_back(tolower(*c));
    if (s == "off") g_log_level = off;
    else if (s == "critical") g_log_level = critical;
    else if (s == "info") g_log_level = info;
    else if (s == "debug") g_log_level = debug;
    else st_errAbort("Unrecognised log level: %s", level);
}

extern "C" int64_t st_getLogLevel(void) { return g_log_level; }

static void log_at(int64_t lvl, const char *fmt, va_list ap) {
    if (g_log_level >= lvl) vfprintf(stderr, fmt, ap);
}

extern "C" void st_logInfo(const char *fmt, ...) {
    va_list ap; va_start(ap, fmt); log_at(info, fmt, ap); va_end(ap);
}
extern "C" void st_logDebug(const char *fmt, ...) {
    va_list ap; va_start(ap, fmt); log_at(debug, fmt, ap); va_end(ap);
}
extern "C" void st_logCritical(const char *fmt, ...) {
    va_list ap; va_start(ap, fmt); log_at(critical, fmt, ap); va_end(ap);
}
extern "C" void st_uglyf(const char *fmt, ...) {
    va_list ap; va_start(ap, fmt); vfprintf(stderr, fmt, ap); va_end(ap);
}

extern "C" void st_errAbort(const char *fmt, ...) {
    va_list ap; va_start(ap, fmt);
    vfprintf(stderr, fmt, ap);
    va_end(ap);
    fprintf(stderr, "\n");
    exit(1);
}

/* ============================== strings ============================= */

extern "C" char *stString_copy(const char *s) {
    char *c = (char *)st_malloc(strlen(s) + 1);
    strcpy(c, s);
    return c;
}

extern "C" char *stString_print(const char *fmt, ...) {
    va_list ap; va_start(ap, fmt);
    char *out = NULL;
    if (vasprintf(&out, fmt, ap) < 0) st_errAbort("stString_print failed");
    va_end(ap);
    return out;
}

extern "C" char *stString_getSubString(const char *s, int64_t start,
                                       int64_t length) {
    char *c = (char *)st_malloc(length + 1);
    memcpy(c, s + start, length);
    c[length] = '\0';
    return c;
}

extern "C" char stString_reverseComplementChar(char c) {
    /* base complement preserving case; non-bases pass through (matches the
     * encoder's tolerance of N/IUPAC bytes) */
    switch (c) {
        case 'a': return 't'; case 'c': return 'g';
        case 'g': return 'c'; case 't': return 'a';
        case 'A': return 'T'; case 'C': return 'G';
        case 'G': return 'C'; case 'T': return 'A';
        case 'm': return 'k'; case 'r': return 'y'; case 'w': return 'w';
        case 's': return 's'; case 'y': return 'r'; case 'k': return 'm';
        case 'v': return 'b'; case 'h': return 'd'; case 'd': return 'h';
        case 'b': return 'v';
        case 'M': return 'K'; case 'R': return 'Y'; case 'W': return 'W';
        case 'S': return 'S'; case 'Y': return 'R'; case 'K': return 'M';
        case 'V': return 'B'; case 'H': return 'D'; case 'D': return 'H';
        case 'B': return 'V';
        default: return c;
    }
}

/* =============================== stList ============================= */

struct _stList {
    std::vector<void *> v;
    void (*destructItem)(void *);
    _stList() : destructItem(NULL) {}
};

extern "C" stList *stList_construct(void) { return new _stList(); }

extern "C" stList *stList_construct3(int64_t size,
                                     void (*destructItem)(void *)) {
    stList *l = new _stList();
    l->v.assign((size_t)size, NULL);
    l->destructItem = destructItem;
    return l;
}

extern "C" int64_t stList_length(stList *l) { return (int64_t)l->v.size(); }
extern "C" void *stList_get(stList *l, int64_t i) { return l->v[(size_t)i]; }
extern "C" void stList_append(stList *l, void *item) { l->v.push_back(item); }

extern "C" void stList_appendAll(stList *to, stList *from) {
    to->v.insert(to->v.end(), from->v.begin(), from->v.end());
}

extern "C" void *stList_peek(stList *l) { return l->v.back(); }

extern "C" void *stList_pop(stList *l) {
    void *item = l->v.back();
    l->v.pop_back();
    return item;
}

extern "C" void stList_sort(stList *l,
                            int (*cmp)(const void *a, const void *b)) {
    /* SHIM-CHOICE: stable (glibc qsort is mergesort in practice; the tile
     * comparator returns 0 on ties, impl/paf_tile.c:28-34, so stability
     * defines the tie order) */
    std::stable_sort(l->v.begin(), l->v.end(),
                     [cmp](void *a, void *b) { return cmp(a, b) < 0; });
}

extern "C" void stList_setDestructor(stList *l,
                                     void (*destructItem)(void *)) {
    l->destructItem = destructItem;
}

extern "C" void *stList_binarySearch(stList *l, void *item,
                                     int (*cmp)(const void *a, const void *b)) {
    /* list sorted by cmp; returns a matching element or NULL.  cmp is
     * called (key, element) — cmp_overlapping_intervals relies on that
     * argument order (impl/paf_upconvert.c:35-50). */
    int64_t lo = 0, hi = (int64_t)l->v.size() - 1;
    while (lo <= hi) {
        int64_t mid = lo + (hi - lo) / 2;
        int c = cmp(item, l->v[(size_t)mid]);
        if (c == 0) return l->v[(size_t)mid];
        if (c < 0) hi = mid - 1; else lo = mid + 1;
    }
    return NULL;
}

extern "C" void stList_destruct(stList *l) {
    if (l->destructItem != NULL)
        for (void *item : l->v)
            if (item != NULL) l->destructItem(item);
    delete l;
}

/* =============================== stHash ============================= */

struct HashOps {
    uint64_t (*hashKey)(const void *);
    int (*equalsKey)(const void *, const void *);
};
struct KeyRef {
    void *key;
    const HashOps *ops;
};
struct KeyHash {
    size_t operator()(const KeyRef &k) const {
        return k.ops->hashKey ? (size_t)k.ops->hashKey(k.key)
                              : (size_t)(uintptr_t)k.key;
    }
};
struct KeyEq {
    bool operator()(const KeyRef &a, const KeyRef &b) const {
        return a.ops->equalsKey ? a.ops->equalsKey(a.key, b.key) != 0
                                : a.key == b.key;
    }
};

struct _stHash {
    HashOps ops;
    std::unordered_map<KeyRef, size_t, KeyHash, KeyEq> index;
    /* SHIM-CHOICE: iteration = insertion order (real sonLib iterates its
     * chained hash in bucket order, which is unknowable without the
     * submodule; insertion order is the deterministic stand-in).  Leaks
     * into output only via paf_to_bed's per-sequence loop and split_file's
     * close loop. */
    std::vector<std::pair<void *, void *> > entries;
    void (*destructKeys)(void *);
    void (*destructValues)(void *);
};

struct _stHashIterator {
    stHash *h;
    size_t pos;
};

extern "C" stHash *stHash_construct2(void (*destructKeys)(void *),
                                     void (*destructValues)(void *)) {
    return stHash_construct3(NULL, NULL, destructKeys, destructValues);
}

extern "C" stHash *stHash_construct3(uint64_t (*hashKey)(const void *),
                                     int (*equalsKey)(const void *, const void *),
                                     void (*destructKeys)(void *),
                                     void (*destructValues)(void *)) {
    stHash *h = new _stHash();
    h->ops.hashKey = hashKey;
    h->ops.equalsKey = equalsKey;
    h->destructKeys = destructKeys;
    h->destructValues = destructValues;
    return h;
}

extern "C" void stHash_insert(stHash *h, void *key, void *value) {
    KeyRef kr = {key, &h->ops};
    auto it = h->index.find(kr);
    if (it != h->index.end()) {
        h->entries[it->second].second = value;  /* replace value, keep slot */
        return;
    }
    h->index.emplace(kr, h->entries.size());
    h->entries.push_back(std::make_pair(key, value));
}

extern "C" void *stHash_search(stHash *h, void *key) {
    KeyRef kr = {key, &h->ops};
    auto it = h->index.find(kr);
    return it == h->index.end() ? NULL : h->entries[it->second].second;
}

extern "C" int64_t stHash_size(stHash *h) {
    return (int64_t)h->entries.size();
}

extern "C" stHashIterator *stHash_getIterator(stHash *h) {
    stHashIterator *it = new _stHashIterator();
    it->h = h;
    it->pos = 0;
    return it;
}

extern "C" void *stHash_getNext(stHashIterator *it) {
    if (it->pos >= it->h->entries.size()) return NULL;
    return it->h->entries[it->pos++].first;
}

extern "C" void stHash_destructIterator(stHashIterator *it) { delete it; }

extern "C" void stHash_destruct(stHash *h) {
    for (auto &e : h->entries) {
        if (h->destructKeys != NULL && e.first != NULL)
            h->destructKeys(e.first);
        if (h->destructValues != NULL && e.second != NULL)
            h->destructValues(e.second);
    }
    delete h;
}

extern "C" uint64_t stHash_stringKey(const void *k) {
    /* FNV-1a over the string bytes (any string hash works — lookups go
     * through equalsKey; iteration order is insertion order regardless) */
    uint64_t hv = 1469598103934665603ULL;
    for (const unsigned char *c = (const unsigned char *)k; *c; ++c)
        hv = (hv ^ *c) * 1099511628211ULL;
    return hv;
}

extern "C" int stHash_stringEqualKey(const void *key1, const void *key2) {
    return strcmp((const char *)key1, (const char *)key2) == 0;
}

/* ============================ stSortedSet =========================== */

struct SetCmp {
    int (*cmp)(const void *, const void *);
    bool operator()(void *a, void *b) const { return cmp(a, b) < 0; }
};

struct _stSortedSet {
    std::set<void *, SetCmp> s;
    void (*destructItem)(void *);
    explicit _stSortedSet(int (*cmp)(const void *, const void *))
        : s(SetCmp{cmp}), destructItem(NULL) {}
};

/* Iterator = libavl traverser: either AT an item or at the single null
 * position; next(null) = first, prev(null) = last (the circular form
 * get_predecessor_chains depends on for both its branches,
 * impl/chaining.c:71-86,168-214). */
struct _stSortedSetIterator {
    stSortedSet *set;
    std::set<void *, SetCmp>::iterator it;
    bool at_null;
};

extern "C" stSortedSet *stSortedSet_construct3(
        int (*compareFn)(const void *, const void *),
        void (*destructItem)(void *)) {
    stSortedSet *s = new _stSortedSet(compareFn);
    s->destructItem = destructItem;
    return s;
}

extern "C" void stSortedSet_insert(stSortedSet *s, void *item) {
    s->s.insert(item);
}

extern "C" void *stSortedSet_remove(stSortedSet *s, void *item) {
    auto it = s->s.find(item);
    if (it == s->s.end()) return NULL;
    void *found = *it;          /* no destructor on remove — the caller
                                 * takes ownership (impl/chaining.c:218) */
    s->s.erase(it);
    return found;
}

extern "C" void *stSortedSet_search(stSortedSet *s, void *item) {
    auto it = s->s.find(item);
    return it == s->s.end() ? NULL : *it;
}

extern "C" void *stSortedSet_searchLessThanOrEqual(stSortedSet *s,
                                                   void *item) {
    /* greatest element <= item under the set's comparator */
    auto it = s->s.upper_bound(item);
    if (it == s->s.begin()) return NULL;
    --it;
    return *it;
}

extern "C" void *stSortedSet_getLast(stSortedSet *s) {
    if (s->s.empty()) return NULL;
    return *s->s.rbegin();
}

extern "C" int64_t stSortedSet_size(stSortedSet *s) {
    return (int64_t)s->s.size();
}

extern "C" stSortedSetIterator *stSortedSet_getIterator(stSortedSet *s) {
    stSortedSetIterator *it = new _stSortedSetIterator();
    it->set = s;
    it->at_null = true;
    return it;
}

extern "C" stSortedSetIterator *stSortedSet_getIteratorFrom(stSortedSet *s,
                                                            void *item) {
    /* positioned so the FIRST getNext returns item (asserted by the
     * commented check at impl/chaining.c:85) */
    auto found = s->s.find(item);
    if (found == s->s.end())
        st_errAbort("stSortedSet_getIteratorFrom: item not in set");
    stSortedSetIterator *it = new _stSortedSetIterator();
    it->set = s;
    if (found == s->s.begin()) {
        it->at_null = true;
    } else {
        it->at_null = false;
        it->it = --found;
    }
    return it;
}

extern "C" void *stSortedSet_getNext(stSortedSetIterator *it) {
    auto &s = it->set->s;
    if (it->at_null) {
        if (s.empty()) return NULL;
        it->it = s.begin();
        it->at_null = false;
        return *it->it;
    }
    ++it->it;
    if (it->it == s.end()) {
        it->at_null = true;
        return NULL;
    }
    return *it->it;
}

extern "C" void *stSortedSet_getPrevious(stSortedSetIterator *it) {
    auto &s = it->set->s;
    if (it->at_null) {
        if (s.empty()) return NULL;
        it->it = --s.end();
        it->at_null = false;
        return *it->it;
    }
    if (it->it == s.begin()) {
        it->at_null = true;
        return NULL;
    }
    --it->it;
    return *it->it;
}

extern "C" void stSortedSet_destructIterator(stSortedSetIterator *it) {
    delete it;
}

extern "C" void stSortedSet_destruct(stSortedSet *s) {
    if (s->destructItem != NULL)
        for (void *item : s->s) s->destructItem(item);
    delete s;
}

/* ============================ stIntTuple ============================ */

struct _stIntTuple { int64_t v; };

extern "C" stIntTuple *stIntTuple_construct1(int64_t i) {
    stIntTuple *t = (stIntTuple *)st_malloc(sizeof(stIntTuple));
    t->v = i;
    return t;
}

extern "C" int64_t stIntTuple_get(stIntTuple *t, int64_t idx) {
    (void)idx;
    return t->v;
}

extern "C" void stIntTuple_destruct(stIntTuple *t) { free(t); }

/* ============================== files =============================== */

extern "C" int64_t stFile_getLineFromFileWithBufferUnlocked(
        char **buffer, int64_t *bufferLen, FILE *f) {
    /* Read one line into the caller's realloc'd buffer, newline stripped.
     * Returns the line length, or -1 at EOF with the buffer holding any
     * final unterminated line ('' at true EOF) — the contract
     * paf_read_with_buffer checks (impl/paf.c:211-218). */
    int64_t n = 0;
    int c;
    for (;;) {
        c = getc_unlocked(f);
        if (c == EOF || c == '\n') break;
        if (n + 2 > *bufferLen) {
            *bufferLen = (*bufferLen < 64 ? 64 : *bufferLen) * 2;
            *buffer = (char *)realloc(*buffer, (size_t)*bufferLen);
            if (*buffer == NULL) st_errAbort("line buffer realloc failed");
        }
        (*buffer)[n++] = (char)c;
    }
    if (*bufferLen < n + 1) { /* n==0 with a tiny caller buffer */
        *bufferLen = n + 1;
        *buffer = (char *)realloc(*buffer, (size_t)*bufferLen);
    }
    (*buffer)[n] = '\0';
    return (c == EOF) ? (n > 0 ? n : -1) : n;
}

extern "C" char *stFile_getLineFromFile(FILE *f) {
    int64_t len = 256;
    char *buf = (char *)st_malloc(len);
    buf[0] = '\0';
    int64_t n = stFile_getLineFromFileWithBufferUnlocked(&buf, &len, f);
    if (n == -1 && buf[0] == '\0') {
        free(buf);
        return NULL;
    }
    return buf;
}

extern "C" bool stFile_exists(const char *path) {
    struct stat st;
    return stat(path, &st) == 0;
}

extern "C" bool stFile_isDir(const char *path) {
    struct stat st;
    return stat(path, &st) == 0 && S_ISDIR(st.st_mode);
}

extern "C" void stFile_mkdir(const char *path) {
    if (mkdir(path, 0777) != 0)
        st_errAbort("Failed to make directory: %s", path);
}

extern "C" stList *stFile_getFileNamesInDirectory(const char *dir) {
    stList *l = stList_construct3(0, free);
    DIR *d = opendir(dir);
    if (d == NULL) st_errAbort("Failed to open directory: %s", dir);
    std::vector<std::string> names;
    struct dirent *e;
    while ((e = readdir(d)) != NULL) {
        if (strcmp(e->d_name, ".") == 0 || strcmp(e->d_name, "..") == 0)
            continue;
        names.push_back(e->d_name);
    }
    closedir(d);
    std::sort(names.begin(), names.end());  /* SHIM-CHOICE: deterministic */
    for (auto &n : names) stList_append(l, stString_copy(n.c_str()));
    return l;
}

/* ========================= string splitting ========================= */

extern "C" stList *stString_split(const char *s) {
    stList *l = stList_construct3(0, free);
    const char *p = s;
    while (*p) {
        while (*p && isspace((unsigned char)*p)) ++p;
        if (!*p) break;
        const char *start = p;
        while (*p && !isspace((unsigned char)*p)) ++p;
        stList_append(l, stString_getSubString(start, 0, p - start));
    }
    return l;
}

extern "C" stList *stString_splitByString(const char *s, const char *sep) {
    /* every (possibly empty) field between separator occurrences */
    stList *l = stList_construct3(0, free);
    size_t seplen = strlen(sep);
    const char *p = s;
    for (;;) {
        const char *hit = seplen ? strstr(p, sep) : NULL;
        if (hit == NULL) {
            stList_append(l, stString_copy(p));
            break;
        }
        stList_append(l, stString_getSubString(p, 0, hit - p));
        p = hit + seplen;
    }
    return l;
}

/* ============================== bioioC ============================== */

extern "C" void fastaReadToFunction(FILE *fasta, void *destination,
                                    void (*processSequence)(void *, const char *,
                                                            const char *, int64_t)) {
    std::string header, seq;
    bool have = false;
    char *line;
    while ((line = stFile_getLineFromFile(fasta)) != NULL) {
        if (line[0] == '>') {
            if (have)
                processSequence(destination, header.c_str(), seq.c_str(),
                                (int64_t)seq.size());
            /* full header line minus '>' and trailing whitespace */
            header.assign(line + 1);
            while (!header.empty() &&
                   isspace((unsigned char)header.back()))
                header.pop_back();
            seq.clear();
            have = true;
        } else if (have) {
            for (char *c = line; *c; ++c)
                if (!isspace((unsigned char)*c)) seq.push_back(*c);
        }
        free(line);
    }
    if (have)
        processSequence(destination, header.c_str(), seq.c_str(),
                        (int64_t)seq.size());
}

extern "C" void fastaRead_readToMapFunction(void *destination,
                                            const char *fastaHeader,
                                            const char *string,
                                            int64_t length) {
    (void)length;
    stHash_insert((stHash *)destination, stString_copy(fastaHeader),
                  stString_copy(string));
}

extern "C" void fastaWrite(char *sequence, char *header, FILE *file) {
    fprintf(file, ">%s\n%s\n", header, sequence);
}

extern "C" char *fastaEncodeHeader(stList *attributes) {
    std::string out;
    for (int64_t i = 0; i < stList_length(attributes); ++i) {
        if (i) out.push_back('|');
        out += (const char *)stList_get(attributes, i);
    }
    return stString_copy(out.c_str());
}

extern "C" stList *fastaDecodeHeader(const char *fastaHeader) {
    return stString_splitByString(fastaHeader, "|");
}
