/* Fake libespeak-ng: exercises the real ctypes FFI in
 * smalltts_tpu/text/phonemize.py (ABI, clause-iteration loop, mode flags)
 * without the actual speech engine. Deterministic: each call consumes one
 * whitespace-separated word from the remaining text and "phonemizes" it as
 * "P<word>"; *textptr advances so the caller's while-loop sees real clause
 * iteration; mode words are recorded for assertions.
 *
 * Build (tests/conftest-free; the test compiles on demand):
 *   cc -shared -fPIC -o fake_espeak.so fake_espeak.c
 */
#include <string.h>

static int g_last_phoneme_mode = -1;
static int g_last_text_mode = -1;
static int g_initialized = 0;
static char g_voice[64];
static char g_out[512];

int espeak_Initialize(int output, int buflength, const char *path, int options) {
    (void)output; (void)buflength; (void)path; (void)options;
    g_initialized = 1;
    return 22050; /* sample rate, >0 = success */
}

int espeak_SetVoiceByName(const char *name) {
    if (!g_initialized) return 1;
    strncpy(g_voice, name, sizeof(g_voice) - 1);
    return 0; /* EE_OK */
}

const char *espeak_TextToPhonemes(const void **textptr, int textmode,
                                  int phonememode) {
    g_last_text_mode = textmode;
    g_last_phoneme_mode = phonememode;
    const char *text = (const char *)*textptr;
    if (!text) return 0;
    while (*text == ' ' || *text == '\n' || *text == '\t') text++;
    if (!*text) { *textptr = 0; return 0; }
    const char *end = text;
    while (*end && *end != ' ' && *end != '\n' && *end != '\t') end++;
    unsigned long n = (unsigned long)(end - text);
    if (n > sizeof(g_out) - 2) n = sizeof(g_out) - 2;
    g_out[0] = 'P';
    memcpy(g_out + 1, text, n);
    g_out[n + 1] = 0;
    while (*end == ' ' || *end == '\n' || *end == '\t') end++;
    *textptr = *end ? (const void *)end : 0;
    return g_out;
}

/* test hooks */
int fake_espeak_last_phoneme_mode(void) { return g_last_phoneme_mode; }
int fake_espeak_last_text_mode(void) { return g_last_text_mode; }
const char *fake_espeak_voice(void) { return g_voice; }
